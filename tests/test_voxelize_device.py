"""On-device voxelizer vs the host rasterizer oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from bflow_tpu.data.representations import VoxelGrid
from bflow_tpu.ops.voxelize import voxelize_events


@pytest.mark.parametrize("int_xy", [True, False])
def test_device_matches_host(rng, int_xy):
    ch, ht, wd = 5, 16, 20
    n, cap = 3000, 4096  # pad to static capacity
    t = np.sort(rng.integers(0, 100000, n)).astype(np.int64)
    pol = rng.integers(0, 2, n).astype(np.float32)
    if int_xy:
        x = rng.integers(0, wd, n).astype(np.int32)
        y = rng.integers(0, ht, n).astype(np.int32)
    else:
        x = rng.uniform(-0.5, wd - 0.5, n).astype(np.float32)
        y = rng.uniform(-0.5, ht - 0.5, n).astype(np.float32)
    t0, t1 = 10000, 90000

    want = VoxelGrid(ch, ht, wd).convert(
        x, y, pol, t, t0, t1
    )  # (C, H, W)

    pad = cap - n
    xp = np.pad(x, (0, pad))
    yp = np.pad(y, (0, pad))
    pp = np.pad(pol, (0, pad))
    tp = np.pad(t, (0, pad))
    valid = np.zeros(cap, bool)
    valid[:n] = True

    got = voxelize_events(
        jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(pp), jnp.asarray(tp),
        jnp.asarray(valid), jnp.asarray(t0), jnp.asarray(t1),
        channels=ch, height=ht, width=wd,
    )
    got = np.asarray(got).transpose(2, 0, 1)  # HWC -> CHW
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_all_padding_gives_zero_grid(rng):
    cap = 128
    got = voxelize_events(
        jnp.zeros(cap, jnp.int32), jnp.zeros(cap, jnp.int32),
        jnp.zeros(cap, jnp.float32), jnp.zeros(cap, jnp.int32),
        jnp.zeros(cap, bool), jnp.asarray(0), jnp.asarray(1000),
        channels=3, height=8, width=8,
    )
    np.testing.assert_array_equal(np.asarray(got), 0.0)
