"""End-to-end CLI smoke: train.py + val.py on a fabricated mini-DSEC.

Exercises the full stack: config composition -> provider -> loader ->
jitted train step on the CPU mesh -> orbax checkpointing -> resume ->
validation with the saved checkpoint.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fixtures import make_dsec_sequence


@pytest.fixture(scope="module")
def mini_dsec(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsec_cli")
    train = root / "train"
    train.mkdir()
    # 480x640 is the DSEC contract baked into the providers; keep the
    # fixture tiny in the temporal dimension instead.
    make_dsec_sequence(
        train, "seq_a", n_flows=3, height=480, width=640,
        events_per_window=2000,
    )
    (root / "test").mkdir()
    return root


def test_train_and_val_cli(mini_dsec, tmp_path, monkeypatch):
    import train as train_entry
    import val as val_entry

    out_dir = tmp_path / "runs"
    overrides = [
        "dataset=dsec",
        "model=raft-spline",
        f"dataset.path={mini_dsec}",
        "wandb.group_name=smoke",
        "+experiment/dsec/raft_spline=E_I_LU4_BD2_lowpyramid",
        # shrink everything for CPU
        "model.num_bins.context=5",
        "model.num_iter.train=2",
        "model.num_iter.test=2",
        "training.batch_size=1",
        "training.max_steps=2",
        "training.max_epochs=1",
        "training.limit_train_batches=2",
        "logging.log_every_n_steps=1",
        f"logging.out_dir={out_dir}",
        "hardware.devices=1",
        "hardware.num_workers=2",
        "dataset.load_voxel_grid=false",
    ]
    train_entry.main(overrides)

    run_dir = out_dir / "smoke_dsec"
    assert (run_dir / "ckpt" / "last").exists()
    meta = json.loads((run_dir / "ckpt" / "meta.json").read_text())
    assert meta["last_step"] == 2
    csv = (run_dir / "train_metrics.csv").read_text()
    assert "train/l1_seq_loss" in csv

    # resume: second invocation restores step 2 and stops immediately
    train_entry.main(overrides)
    meta = json.loads((run_dir / "ckpt" / "meta.json").read_text())
    assert meta["last_step"] == 2

    # validation from the saved orbax checkpoint
    val_overrides = [
        "dataset=dsec",
        "model=raft-spline",
        f"dataset.path={mini_dsec}",
        f"checkpoint={run_dir / 'ckpt' / 'last'}",
        "model.num_bins.context=5",
        "model.num_iter.test=2",
        "batch_size=1",
        "hardware.num_workers=2",
        "dataset.load_voxel_grid=false",
        "model.use_boundary_images=true",
        "model.correlation.ev.levels=[1,1,1,4]",
    ]
    val_entry.main(val_overrides)
    out = Path("./validation_logs/val_metrics.csv").read_text()
    assert "val/epe" in out


def test_media_logger_renders(tmp_path, rng):
    from bflow_tpu.callbacks.logger import MediaLogger
    from bflow_tpu.data.keys import DataLoading as K

    captured = {}

    class FakeLogger:
        def log_image(self, key, image, step, caption=""):
            captured[key] = np.asarray(image)

    batch = {
        K.EV_REPR.value: rng.standard_normal((1, 32, 48, 9)).astype(np.float32),
        K.IMG.value: rng.integers(0, 255, (2, 1, 32, 48, 3)).astype(np.float32),
        K.FLOW.value: rng.standard_normal((1, 32, 48, 2)).astype(np.float32),
        K.FLOW_VALID.value: np.ones((1, 32, 48), bool),
    }
    pred = rng.standard_normal((1, 32, 48, 2)).astype(np.float32)
    bez = rng.standard_normal((1, 32, 48, 2, 2)).astype(np.float32)

    ml = MediaLogger(FakeLogger(), "dsec", every_n_steps=1)
    ml.on_train_batch(1, batch, pred, bez)
    assert "train/summary" in captured
    strip = captured["train/summary"]
    assert strip.shape[0] == 32 and strip.shape[2] == 3
    assert strip.shape[1] == 5 * 48  # events|img|pred|gt|error panels
    assert "train/bezier_trajectories" in captured

    ml.on_validation_batch(1, 0, batch, pred)
    assert "val/summary_0" in captured


@pytest.fixture(scope="module")
def mini_multiflow(tmp_path_factory):
    from fixtures import make_multiflow_sample

    root = tmp_path_factory.mktemp("mf_cli")
    for split in ("train", "val"):
        d = root / split
        d.mkdir()
        # native MultiFlow resolution so the default pipeline runs as-is
        make_multiflow_sample(d, "seq_0001", height=384, width=512,
                              num_bins_context=6, seed=1)
    return root


def test_multiflow_train_cli(mini_multiflow, tmp_path):
    import train as train_entry

    out_dir = tmp_path / "runs"
    overrides = [
        "dataset=multiflow_regen",
        "model=raft-spline",
        f"dataset.path={mini_multiflow}",
        "wandb.group_name=mfsmoke",
        "+experiment/multiflow/raft_spline=E_I_LU5_BD10_lowpyramid",
        # shrink: 6 context bins instead of 41, degree 2, 1 iter
        "model.num_bins.context=6",
        "model.num_bins.correlation=4",
        "model.bezier_degree=2",
        "model.correlation.ev.target_indices=[1,3,5]",
        "model.correlation.ev.levels=[1,1,2]",
        "model.num_iter.train=1",
        "model.num_iter.test=1",
        "training.batch_size=1",
        "training.max_steps=1",
        "training.max_epochs=1",
        "training.limit_train_batches=1",
        "training.limit_val_batches=1",
        "dataset.flow_every_n_ms=100",
        "logging.log_every_n_steps=1",
        f"logging.out_dir={out_dir}",
        "hardware.devices=1",
        "hardware.num_workers=2",
        "dataset.load_voxel_grid=false",
    ]
    train_entry.main(overrides)

    run_dir = out_dir / "mfsmoke_multiflow_regen"
    csv = (run_dir / "train_metrics.csv").read_text()
    assert "train/l1_multi_seq_loss" in csv
    assert "val/epe_multi" in csv  # epoch validation ran


def test_val_cli_with_torch_checkpoint(mini_dsec, tmp_path):
    """val.py consumes a PyTorch Lightning .ckpt (the released-checkpoint
    format) end-to-end: torch.load -> key map -> conversion -> inference."""
    import torch

    import val as val_entry
    from test_importer import reference_state_dict
    from bflow_tpu.models import RaftSplineConfig

    cfg = RaftSplineConfig(
        nbins_context=5, nbins_correlation=5, bezier_degree=2,
        ev_target_indices=(1, 2, 3, 4), ev_levels=(1, 1, 1, 4),
        use_images=True, iters_test=2,
    )
    sd = {k: torch.from_numpy(np.asarray(v)) if np.asarray(v).ndim else
          torch.tensor(v) for k, v in reference_state_dict(cfg).items()}
    ckpt_path = tmp_path / "released_style.ckpt"
    torch.save({"state_dict": sd, "epoch": 3}, str(ckpt_path))

    val_entry.main([
        "dataset=dsec",
        "model=raft-spline",
        f"dataset.path={mini_dsec}",
        f"checkpoint={ckpt_path}",
        "model.num_bins.context=5",
        "model.num_iter.test=2",
        "batch_size=1",
        "hardware.num_workers=2",
        "dataset.load_voxel_grid=false",
        "model.use_boundary_images=true",
        "model.correlation.ev.levels=[1,1,1,4]",
    ])
    out = Path("./validation_logs/val_metrics.csv").read_text()
    assert "val/epe" in out


def test_predict_dsec_script(mini_dsec, tmp_path):
    """Submission-format prediction over the (fallback) train split."""
    import sys as _sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import predict_dsec

    import train as train_entry

    # quick checkpoint to consume
    out_dir = tmp_path / "runs"
    train_entry.main([
        "dataset=dsec", "model=raft-spline", f"dataset.path={mini_dsec}",
        "wandb.group_name=pred", "model.num_bins.context=5",
        "model.num_iter.train=1", "model.num_iter.test=1",
        "training.batch_size=1", "training.max_steps=1",
        "training.max_epochs=1", "training.limit_train_batches=1",
        f"logging.out_dir={out_dir}", "hardware.devices=1",
        "hardware.num_workers=2", "dataset.load_voxel_grid=false",
        "model.use_boundary_images=true",
        "model.correlation.ev.levels=[1,1,1,4]",
    ])

    sub_dir = tmp_path / "submission"
    predict_dsec.main([
        f"dataset.path={mini_dsec}",
        f"checkpoint={out_dir / 'pred_dsec' / 'ckpt' / 'last'}",
        f"output_dir={sub_dir}",
        "model.num_bins.context=5",
        "model.num_iter.test=1",
        "dataset.load_voxel_grid=false",
        "model.use_boundary_images=true",
        "model.correlation.ev.levels=[1,1,1,4]",
    ])
    pngs = sorted(sub_dir.glob("*/*.png"))
    assert len(pngs) == 3  # mini_dsec has 3 flow windows
    assert pngs[0].parent.name == "train_split"
    from bflow_tpu.data.io import load_flow_png

    flow, valid = load_flow_png(pngs[0])
    assert flow.shape == (480, 640, 2)
    assert valid.all()
