"""Streaming inference from RAW events, fully on-device.

Demonstrates the deployment path the reference cannot express: raw event
tensors go straight to the TPU, are rasterized into the merged voxel
grid inside the jitted graph (ops/voxelize), and RAFT-Spline produces
Bezier flow curves queryable at any continuous timestamp — no host-side
voxel building, no HDF5 cache.

Run (synthetic events): python examples/streaming_inference.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bflow_tpu.models import RAFTSpline, RaftSplineConfig
from bflow_tpu.ops.voxelize import voxelize_events

# A small streaming config: 5 context bins over a 100 ms window.
CFG = RaftSplineConfig(
    nbins_context=5,
    nbins_correlation=5,
    ev_target_indices=(1, 2, 3, 4),
    ev_levels=(1, 1, 1, 4),
    use_images=False,
    iters_test=6,
    corr_precision="bfloat16",
    compute_dtype="bfloat16",
)
H, W = 256, 320
EVENT_CAPACITY = 1 << 19  # static padding for jit (524k events/window)


def make_pipeline():
    model = RAFTSpline(CFG)

    def pipeline(variables, x, y, p, t, valid, t0, t1, query_times):
        """Raw padded events -> merged voxel grid -> continuous flow."""
        # The merged two-window grid spans 2*nbins-1 bins over [t0-dt, t1]
        nbins_total = CFG.nbins_total
        window = t1 - t0
        grid = voxelize_events(
            x, y, p, t, valid,
            t0 - window, t1,
            channels=nbins_total, height=H, width=W,
        )
        _, bezier_up = model.apply(
            variables, grid[None], None, test_mode=True
        )
        return bezier_up.flow_at(query_times)

    return model, pipeline


def synthetic_events(rng, n):
    return (
        rng.integers(0, W, n).astype(np.int32),
        rng.integers(0, H, n).astype(np.int32),
        rng.integers(0, 2, n).astype(np.float32),
        np.sort(rng.integers(0, 200_000, n)).astype(np.int32),
    )


def main():
    rng = np.random.default_rng(0)
    model, pipeline = make_pipeline()

    n = 300_000
    x, y, p, t = synthetic_events(rng, n)
    pad = EVENT_CAPACITY - n
    valid = np.zeros(EVENT_CAPACITY, bool)
    valid[:n] = True
    args = tuple(
        jnp.asarray(np.pad(a, (0, pad))) for a in (x, y, p, t)
    ) + (jnp.asarray(valid), jnp.asarray(100_000), jnp.asarray(200_000))

    query_times = (0.25, 0.5, 0.75, 1.0)
    variables = jax.jit(
        lambda xx: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, CFG.nbins_total)),
            None,
            test_mode=True,
        )
    )(0)

    fn = jax.jit(
        lambda v, *a: pipeline(v, *a, query_times=query_times)
    )
    t0 = time.time()
    flows = fn(variables, *args)
    s = float(flows.sum())
    print(f"compile+first window: {time.time() - t0:.0f}s")

    K = 8
    t0 = time.perf_counter()
    for _ in range(K - 1):
        fn(variables, *args)
    s = float(fn(variables, *args).sum())
    dt = (time.perf_counter() - t0) / K
    print(
        f"streaming window ({n} raw events -> voxel grid -> "
        f"{len(query_times)} continuous-time flow fields @ {H}x{W}): "
        f"{dt * 1000:.1f} ms -> {1 / dt:.1f} windows/s"
    )
    print("flow shapes:", flows.shape, "finite:", bool(jnp.isfinite(flows).all()))


if __name__ == "__main__":
    main()
