"""Round-trip guard for the released-checkpoint parity harness.

The four released reference checkpoints (/root/reference/README.md:67-95)
are unreachable offline, so scripts/parity_released.py cannot be run for
real yet. This fast test keeps the harness warm (VERDICT r3 #8): export a
reference-format PL `.ckpt`, then drive the harness's own entry points
(load_state_dict -> infer_config -> our_flow) and check the architecture
inference and the imported forward. The day the released files become
reachable, the command is simply:

    python scripts/parity_released.py E_I_LU4_BD2.ckpt dataset.path=DIR
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from test_importer import reference_state_dict  # noqa: E402

from bflow_tpu.models import RaftSplineConfig  # noqa: E402


@pytest.mark.parametrize(
    "use_images,degree",
    [(True, 2), (False, 10)],
    ids=["dsec_ei_bd2", "multiflow_e_bd10"],
)
def test_parity_released_round_trip(tmp_path, use_images, degree):
    import torch

    import parity_released as pr

    if degree <= 2:  # DSEC family shape (shrunk bins for speed)
        cfg = RaftSplineConfig(
            nbins_context=5, nbins_correlation=5, bezier_degree=2,
            ev_target_indices=(1, 2, 3, 4), ev_levels=(1, 1, 1, 4),
            use_events=True, use_images=use_images,
        )
    else:  # MultiFlow family: 5 targets, degree 10
        cfg = RaftSplineConfig(
            nbins_context=41, nbins_correlation=25, bezier_degree=10,
            ev_target_indices=(8, 16, 24, 32, 40),
            ev_levels=(1, 1, 1, 1, 4),
            use_events=True, use_images=use_images,
        )

    sd_np = reference_state_dict(cfg)
    if not use_images:
        sd_np = {k: v for k, v in sd_np.items()
                 if not k.startswith("net.fnet_img.")}
        # the cnet STEM loses the 3 image input channels
        k = "net.cnet.conv1.weight"
        sd_np[k] = sd_np[k][:, : cfg.nbins_context]
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
    ckpt = tmp_path / "released_style.ckpt"
    torch.save({"state_dict": sd, "epoch": 1, "global_step": 7}, ckpt)

    # harness entry points, exactly as main() uses them
    loaded = pr.load_state_dict(str(ckpt))
    got_cfg, name = pr.infer_config(loaded)
    assert got_cfg.use_images == use_images
    assert got_cfg.bezier_degree == cfg.bezier_degree
    assert got_cfg.nbins_context == cfg.nbins_context
    assert got_cfg.nbins_correlation == cfg.nbins_correlation
    assert got_cfg.ev_target_indices == cfg.ev_target_indices
    assert ("E_I" if use_images else "E") in name

    rng = np.random.default_rng(0)
    voxel = rng.standard_normal(
        (1, got_cfg.nbins_total, 32, 32)
    ).astype(np.float32)
    images = [
        rng.integers(0, 255, (1, 3, 32, 32)).astype(np.float32)
        for _ in range(2)
    ]
    flows = pr.our_flow(
        got_cfg, loaded, voxel, images, iters=1, times=(0.5, 1.0),
        precision="float32",
    )
    assert set(flows) == {0.5, 1.0}
    for t, f in flows.items():
        assert f.shape == (1, 2, 32, 32), (t, f.shape)
        assert np.isfinite(f).all(), t
