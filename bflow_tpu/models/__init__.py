from bflow_tpu.models.config import RaftSplineConfig
from bflow_tpu.models.raft_spline import RAFTSpline

__all__ = ["RaftSplineConfig", "RAFTSpline"]
