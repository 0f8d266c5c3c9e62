"""Headline benchmark: DSEC 480x640 events+images inference throughput.

Measures dense continuous-time flow fields per second per chip on the
flagship config (E_I_LU4_BD2_lowpyramid, 15 context bins, 12 refinement
iterations, full 480x640 resolution) and compares against the BASELINE
target of 200 fields/sec/chip on TPU v5e.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fields/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

BASELINE_FIELDS_PER_SEC = 200.0


def _config_overrides(cfg):
    """Optional env-var config overrides for same-session flag A/Bs:
    BFLOW_BENCH_LOOKUP=<method>, BFLOW_BENCH_FUSE=1, BFLOW_BENCH_SCAN=1.
    Unset -> the committed defaults (what the driver measures)."""
    repl = {}
    if os.environ.get("BFLOW_BENCH_LOOKUP"):
        repl["lookup_method"] = os.environ["BFLOW_BENCH_LOOKUP"]
    if os.environ.get("BFLOW_BENCH_FUSE"):
        repl["fuse_corr_conv"] = os.environ["BFLOW_BENCH_FUSE"] == "1"
    if os.environ.get("BFLOW_BENCH_SCAN"):
        repl["scan_iters"] = os.environ["BFLOW_BENCH_SCAN"] == "1"
    if os.environ.get("BFLOW_BENCH_STEM"):
        repl["pallas_stem"] = os.environ["BFLOW_BENCH_STEM"] == "1"
    if os.environ.get("BFLOW_BENCH_CONV"):
        repl["pallas_conv"] = os.environ["BFLOW_BENCH_CONV"] == "1"
    if os.environ.get("BFLOW_BENCH_ONEHOT_LVL"):
        repl["onehot_from_level"] = int(os.environ["BFLOW_BENCH_ONEHOT_LVL"])
    if repl:
        print(f"# overrides: {repl}", file=__import__("sys").stderr)
        cfg = dataclasses.replace(cfg, **repl)
    return cfg


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bflow_tpu.models import RAFTSpline

    from __graft_entry__ import _flagship_config

    cfg = _config_overrides(_flagship_config())
    model = RAFTSpline(cfg)

    H, W = 480, 640
    rng = np.random.default_rng(0)

    def make_inputs(n):
        voxel = jnp.asarray(
            rng.standard_normal((n, H, W, cfg.nbins_total)), jnp.float32
        )
        images = jnp.asarray(
            rng.integers(0, 255, (2, n, H, W, 3)), jnp.float32
        )
        return voxel, images

    # Params are spatial-size independent (conv net): init at a tiny
    # crop so the 480x640 12-iteration graph is compiled ONCE below,
    # not twice — each full compile costs minutes through the relay's
    # remote-compile path and was pushing bench past the driver window.
    voxel0 = jnp.zeros((1, 64, 64, cfg.nbins_total), jnp.float32)
    images0 = jnp.zeros((2, 1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda v, i: model.init(jax.random.PRNGKey(0), v, i, test_mode=True)
    )(voxel0, images0)

    @jax.jit
    def forward(variables, voxel, images):
        _, bezier_up = model.apply(variables, voxel, images, test_mode=True)
        # scalar checksum: forcing its value to host guarantees the whole
        # forward executed (block_until_ready can be a relay no-op)
        return bezier_up.flow_at(1.0).sum()

    def is_oom(exc) -> bool:
        msg = f"{type(exc).__name__}: {exc}"
        return any(s in msg for s in
                   ("RESOURCE_EXHAUSTED", "Out of memory", "OOM",
                    "Allocator", "exceeds the memory"))

    best = 0.0
    best_batch = 1
    # batch 16 is the measured optimum (8 within noise, 1 well below);
    # the smaller batches exist ONLY as fallbacks if a regression ever
    # OOMs batch 16 — trying 16 first avoids two extra multi-minute
    # 480x640 compiles per bench run
    batches = (16, 8, 1)
    if os.environ.get("BFLOW_BENCH_BATCH"):
        # A/B hook: try a specific batch first (e.g. q8 frees ~3 GB of
        # volume HBM, so batches > 16 become feasible). Fallbacks are
        # only batches STRICTLY smaller than the requested one — an OOM
        # at batch b guarantees every batch >= b also OOMs, and each
        # doomed attempt costs a multi-minute 480x640 compile.
        b = int(os.environ["BFLOW_BENCH_BATCH"])
        batches = (b,) + tuple(x for x in batches if x < b)
    for batch in batches:
        if best > 0.0:
            break  # a larger batch already succeeded
        try:
            voxel, images = make_inputs(batch)
            s = float(forward(variables, voxel, images))  # compile+warmup
            assert np.isfinite(s)
            # steady state: K async dispatches, one forced readback —
            # in-order execution makes the wall time exact
            K = 8
            t0 = time.perf_counter()
            for _ in range(K - 1):
                forward(variables, voxel, images)
            s = float(forward(variables, voxel, images))
            dt = time.perf_counter() - t0
            fps = batch * K / dt
            if fps > best:
                best, best_batch = fps, batch
        except Exception as exc:
            # ONLY an OOM may fall through to the next smaller batch;
            # any other failure is a real regression and must fail the
            # benchmark loudly (VERDICT r1, weak #3).
            if is_oom(exc) and batch > 1:
                print(f"# batch {batch} OOM, trying smaller",
                      file=__import__("sys").stderr)
                continue
            raise

    print(
        json.dumps(
            {
                "metric": "dsec_480x640_ei_inference_throughput",
                "value": round(best, 2),
                "unit": "fields/sec/chip",
                "vs_baseline": round(best / BASELINE_FIELDS_PER_SEC, 3),
                "batch_size": best_batch,
            }
        )
    )


if __name__ == "__main__":
    main()
