from bflow_tpu.train.schedule import onecycle_linear_schedule
from bflow_tpu.train.optimizer import build_optimizer
from bflow_tpu.train.state import TrainState
from bflow_tpu.train.step import TaskConfig, make_eval_step, make_train_step

__all__ = [
    "onecycle_linear_schedule",
    "build_optimizer",
    "TrainState",
    "TaskConfig",
    "make_train_step",
    "make_eval_step",
]
