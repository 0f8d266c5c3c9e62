"""Observability wiring: artifact resume, media logger paths, histograms."""

from pathlib import Path

import numpy as np
import pytest

from bflow_tpu.callbacks.logger import MediaLogger
from bflow_tpu.data.keys import DataLoading as K
from bflow_tpu.train.checkpoint import resolve_artifact_checkpoint


class FakeWandb:
    """Records calls; mimics the WandbLogger surface."""

    def __init__(self, download_result=None):
        self.images = []
        self.downloads = []
        self._download_result = download_result
        self.enabled = True

    def log_image(self, key, image, step, caption=""):
        self.images.append((key, np.asarray(image).shape, step))

    def download_checkpoint(self, runpath, name):
        self.downloads.append((runpath, name))
        return self._download_result


# -- artifact resume (reference train.py:93-106) ---------------------------

def test_resolve_artifact_local_path(tmp_path):
    ckpt = tmp_path / "weights.ckpt"
    ckpt.write_bytes(b"x")
    logger = FakeWandb()
    out = resolve_artifact_checkpoint({"artifact_name": str(ckpt)}, logger)
    assert out == ckpt
    assert logger.downloads == []  # local path never hits the network


def test_resolve_artifact_none():
    assert resolve_artifact_checkpoint({}, FakeWandb()) is None
    assert resolve_artifact_checkpoint({"artifact_name": None}, FakeWandb()) is None


def test_resolve_artifact_requires_runpath(capsys):
    out = resolve_artifact_checkpoint(
        {"artifact_name": "checkpoint-abc:v3"}, FakeWandb()
    )
    assert out is None
    assert "artifact_runpath" in capsys.readouterr().out


def test_resolve_artifact_downloads_and_picks_ckpt(tmp_path):
    art_dir = tmp_path / "artifact"
    art_dir.mkdir()
    (art_dir / "model.ckpt").write_bytes(b"x")
    logger = FakeWandb(download_result=art_dir)
    cfg = {
        "artifact_name": "checkpoint-abc:v3",
        "artifact_runpath": "team/proj/run-1",
    }
    out = resolve_artifact_checkpoint(cfg, logger)
    assert out == art_dir / "model.ckpt"
    assert logger.downloads == [("team/proj/run-1", "checkpoint-abc:v3")]


def test_resolve_artifact_falls_back_to_wandb_runpath(tmp_path):
    art_dir = tmp_path / "artifact"
    (art_dir / "state").mkdir(parents=True)  # orbax-style dir
    logger = FakeWandb(download_result=art_dir)
    cfg = {
        "artifact_name": "checkpoint-abc:v3",
        "wandb_runpath": "team/proj/run-2",
    }
    out = resolve_artifact_checkpoint(cfg, logger)
    assert out == art_dir / "state"
    assert logger.downloads[0][0] == "team/proj/run-2"


# -- media logger -----------------------------------------------------------

def _batch(n=1, h=16, w=16):
    rng = np.random.default_rng(0)
    return {
        K.EV_REPR.value: rng.standard_normal((n, h, w, 5)).astype(np.float32),
        K.IMG.value: rng.integers(0, 255, (2, n, h, w, 3)).astype(np.float32),
        K.FLOW.value: rng.standard_normal((n, h, w, 2)).astype(np.float32),
        K.FLOW_VALID.value: np.ones((n, h, w), bool),
    }


def test_media_train_batch_logs_bezier():
    logger = FakeWandb()
    ml = MediaLogger(logger, "dsec", every_n_steps=1)
    rng = np.random.default_rng(0)
    bez = rng.standard_normal((1, 2, 2, 2, 2)).astype(np.float32)
    ml.on_train_batch(10, _batch(), rng.standard_normal((1, 16, 16, 2)),
                      bezier_params=bez)
    keys = [k for k, _, _ in logger.images]
    assert "train/summary" in keys
    assert "train/bezier_trajectories" in keys


def test_media_val_plan_is_deterministic_seed0():
    import random

    logger = FakeWandb()
    ml = MediaLogger(logger, "dsec", every_n_steps=1, n_val_predictions=3)
    ml.plan_validation(20)
    random.seed(0)
    expected = set(random.sample(range(20), 3))
    assert ml._val_indices == expected

    rng = np.random.default_rng(0)
    pred = rng.standard_normal((1, 16, 16, 2))
    for idx in range(20):
        ml.on_validation_batch(5, idx, _batch(), pred)
    logged = {int(k.rsplit("_", 1)[1]) for k, _, _ in logger.images}
    assert logged == expected


def test_media_grad_figure_throttled():
    logger = FakeWandb()
    ml = MediaLogger(logger, "dsec", every_n_steps=100)
    norms = {"fnet_ev/conv1/kernel": 0.1, "update_block/gru/convz1/bias": 0.02}
    ml.on_after_backward(100, norms)
    ml.on_after_backward(150, norms)  # inside throttle window: skipped
    ml.on_after_backward(200, norms)
    keys = [k for k, _, _ in logger.images]
    assert keys.count("train/gradients") == 2


def test_media_disabled_logs_nothing():
    logger = FakeWandb()
    ml = MediaLogger(logger, "dsec", every_n_steps=1, enabled=False)
    ml.on_train_batch(1, _batch(), np.zeros((1, 16, 16, 2)))
    ml.on_after_backward(1, {"a": 1.0})
    ml.on_validation_batch(1, 0, _batch(), np.zeros((1, 16, 16, 2)))
    assert logger.images == []
