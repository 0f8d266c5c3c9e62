"""Per-stage TPU timing of the flagship inference path.

Times each stage of the DSEC 480x640 events+images forward (encoders,
correlation volume, lookup, update block, upsample, full forward) on the
real chip. Through the axon relay a dispatch costs ~2.4 ms and a scalar
readback ~31 ms, so sub-millisecond stages are repeated R times inside
one jitted lax.fori_loop (inputs perturbed by the loop carry to defeat
CSE/hoisting) and the per-op time is the slope between two R values.

Usage: python scripts/perf_breakdown.py [batch=4] [stage ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_config
    from bflow_tpu.models import RAFTSpline
    from bflow_tpu.models.corr import build_corr_pyramid, corr_lookup
    from bflow_tpu.models.extractor import BasicEncoder
    from bflow_tpu.models.update import BasicUpdateBlock
    from bflow_tpu.ops.bezier import BezierCurves
    from bflow_tpu.ops.sampler import coords_grid

    args = sys.argv[1:]
    N = int(args[0]) if args and args[0].isdigit() else 4
    only = set(a for a in args if not a.isdigit())

    cfg = _flagship_config()
    H, W = 480, 640
    h1, w1 = H // 8, W // 8
    T = cfg.num_targets  # 5
    D = cfg.feature_dim
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    print(f"# perf breakdown: batch={N}, backend={jax.default_backend()}")

    def timed(name, make_fn, *args_np, reps=(4, 12)):
        """make_fn(R) -> jitted fn(acc0, *args) -> scalar; slope timing."""
        if only and name not in only:
            return
        arrs = [jnp.asarray(a) for a in args_np]
        results = {}
        for R in reps:
            fn = make_fn(R)
            out = fn(jnp.float32(0.0), *arrs)  # compile + warmup
            jax.block_until_ready(out)
            float(out)
            # min of 3: the relay adds tens of ms of per-dispatch noise,
            # which otherwise swamps the slope
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                v = float(fn(jnp.float32(0.0), *arrs))
                best = min(best, time.perf_counter() - t0)
                assert np.isfinite(v), (name, v)
            results[R] = best
        r1, r2 = reps
        per_op = (results[r2] - results[r1]) / (r2 - r1) * 1e3
        print(f"{name:18s} {per_op:8.2f} ms/op   "
              f"(R={r1}: {results[r1]*1e3:.1f} ms, R={r2}: {results[r2]*1e3:.1f} ms)")
        return per_op

    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    # ---- encoders -------------------------------------------------------
    enc_ev = BasicEncoder(cfg.feature_dim, cfg.feature_norm, dtype=dt)
    grids5 = rng.standard_normal((5 * N, H, W, cfg.nbins_correlation)).astype(np.float32)
    vars_ev = jax.jit(enc_ev.init)(key, grids5[:1])

    def mk_enc(R):
        @jax.jit
        def f(acc, x):
            def body(i, acc):
                out = enc_ev.apply(vars_ev, x + acc)
                return acc + out.astype(jnp.float32).sum() * 1e-20
            return jax.lax.fori_loop(0, R, body, acc)
        return f

    timed("enc_ev_5grids", mk_enc, grids5)

    imgs2 = rng.standard_normal((2 * N, H, W, 3)).astype(np.float32)
    vars_img = jax.jit(enc_ev.init)(key, imgs2[:1])

    def mk_enc_img(R):
        @jax.jit
        def f(acc, x):
            def body(i, acc):
                out = enc_ev.apply(vars_img, x + acc)
                return acc + out.astype(jnp.float32).sum() * 1e-20
            return jax.lax.fori_loop(0, R, body, acc)
        return f

    timed("enc_img_2", mk_enc_img, imgs2)

    cnet = BasicEncoder(cfg.hidden_dim + cfg.context_dim, cfg.context_norm, dtype=dt)
    ctx_in = rng.standard_normal((N, H, W, cfg.nbins_context + 3)).astype(np.float32)
    vars_c = jax.jit(cnet.init)(key, ctx_in[:1])

    def mk_cnet(R):
        @jax.jit
        def f(acc, x):
            def body(i, acc):
                out = cnet.apply(vars_c, x + acc)
                return acc + out.astype(jnp.float32).sum() * 1e-20
            return jax.lax.fori_loop(0, R, body, acc)
        return f

    timed("cnet", mk_cnet, ctx_in)

    # ---- correlation volume + pyramid -----------------------------------
    fr = rng.standard_normal((T, N, h1, w1, D)).astype(np.float32) * 0.5
    ft = rng.standard_normal((T, N, h1, w1, D)).astype(np.float32) * 0.5

    def mk_vol(R):
        @jax.jit
        def f(acc, fr, ft):
            def body(i, acc):
                pyr = build_corr_pyramid(fr + acc, ft, cfg.levels_per_target,
                                         precision=cfg.corr_precision)
                s = sum(v.astype(jnp.float32).sum() for _, v in pyr)
                return acc + s * 1e-20
            return jax.lax.fori_loop(0, R, body, acc)
        return f

    timed("volume_pyramid", mk_vol, fr, ft)

    # ---- lookup (one iteration, all levels) ------------------------------
    from bflow_tpu.models.corr import build_pyramid_for_method

    # the pyramid builders compile for minutes through the relay — skip
    # them entirely when no lookup stage was requested
    want_lookup = not only or any(
        s == "lookup_iter" or s.startswith("lookup_lvl") for s in only
    )
    if want_lookup:
        slab_pyramid = jax.jit(
            lambda fr, ft: build_pyramid_for_method(
                fr, ft, cfg.levels_per_target,
                precision=cfg.corr_precision, method="pallas")
        )(jnp.asarray(fr), jnp.asarray(ft))
        pyr_idx = [i for i, _ in slab_pyramid]
        pyr_vols = [v for _, v in slab_pyramid]
    else:
        slab_pyramid, pyr_idx, pyr_vols = [], [], []
    coords = (
        coords_grid(N, h1, w1)[None]
        + rng.standard_normal((T, N, h1, w1, 2)).astype(np.float32) * 3.0
    )

    def mk_lookup(R):
        @jax.jit
        def f(acc, coords, *vols):
            pyr = list(zip(pyr_idx, vols))
            def body(i, acc):
                out = corr_lookup(pyr, coords + acc, cfg.radius,
                                  method="pallas",
                                  precision=cfg.corr_precision)
                return acc + out.astype(jnp.float32).sum() * 1e-20
            return jax.lax.fori_loop(0, R, body, acc)
        return f

    timed("lookup_iter", mk_lookup, coords, *pyr_vols)

    # per-level lookup (v4 slab kernel — the production default)
    for lvl in range(len(slab_pyramid)):
        idx_l, vol_l = slab_pyramid[lvl]
        c_l = np.asarray(coords)[list(idx_l)] / (2.0 ** lvl)

        def mk_lkl(R, vol_l=vol_l):
            from bflow_tpu.ops.pallas.corr_lookup_v3 import lookup_level_slab

            @jax.jit
            def f(acc, c, vol):
                def body(i, acc):
                    out = lookup_level_slab(vol, c + acc, cfg.radius)
                    return acc + out.astype(jnp.float32).sum() * 1e-20
                return jax.lax.fori_loop(0, R, body, acc)
            return f

        timed(f"lookup_lvl{lvl}", mk_lkl, c_l, vol_l)

    # ---- update block ----------------------------------------------------
    upd = BasicUpdateBlock(cfg)
    net0 = rng.standard_normal((N, h1, w1, cfg.hidden_dim)).astype(np.float32)
    inp0 = rng.standard_normal((N, h1, w1, cfg.context_dim)).astype(np.float32)
    corr0 = rng.standard_normal((N, h1, w1, cfg.corr_planes)).astype(np.float32)
    bez0 = rng.standard_normal((N, h1, w1, 2 * cfg.bezier_degree)).astype(np.float32)
    vars_u = jax.jit(upd.init)(key, net0[:1], inp0[:1], corr0[:1], bez0[:1])

    def mk_upd(R):
        @jax.jit
        def f(acc, net, inp, corr, bez):
            def body(i, carry):
                acc, net = carry
                net2, mask, delta = upd.apply(vars_u, net, inp, corr + acc, bez)
                return (acc + mask.sum() * 1e-20 + delta.sum() * 1e-20,
                        net2.astype(net.dtype))
            acc, net = jax.lax.fori_loop(0, R, body, (acc, net))
            return acc + net.astype(jnp.float32).sum() * 1e-20
        return f

    timed("update_block", mk_upd, net0, inp0, corr0, bez0)

    # ---- convex upsample --------------------------------------------------
    bez_lo = BezierCurves(jnp.asarray(
        rng.standard_normal((N, h1, w1, cfg.bezier_degree, 2)).astype(np.float32)))
    mask0 = rng.standard_normal((N, h1, w1, 576)).astype(np.float32)

    def mk_ups(R):
        @jax.jit
        def f(acc, params, mask):
            def body(i, acc):
                up = BezierCurves(params + acc).upsampled(mask)
                return acc + up.params.sum() * 1e-20
            return jax.lax.fori_loop(0, R, body, acc)
        return f

    timed("upsample", mk_ups, bez_lo.params, mask0)

    # ---- full forward -----------------------------------------------------
    model = RAFTSpline(cfg)
    voxel = rng.standard_normal((N, H, W, cfg.nbins_total)).astype(np.float32)
    images = rng.integers(0, 255, (2, N, H, W, 3)).astype(np.float32)
    variables = jax.jit(
        lambda v, i: model.init(key, v, i, test_mode=True)
    )(jnp.asarray(voxel), jnp.asarray(images))

    def mk_full(iters):
        def make(R):
            @jax.jit
            def f(acc, voxel, images):
                def body(i, acc):
                    _, up = model.apply(variables, voxel + acc, images,
                                        iters=iters, test_mode=True)
                    return acc + up.params.sum() * 1e-20
                return jax.lax.fori_loop(0, R, body, acc)
            return f
        return make

    t12 = timed("full_12iter", mk_full(12), voxel, images, reps=(2, 6))
    t1 = timed("full_1iter", mk_full(1), voxel, images, reps=(2, 6))
    if t12 is not None and t1 is not None:
        print(f"-> marginal per iteration: {(t12 - t1) / 11:.2f} ms; "
              f"one-time: {t1 - (t12 - t1) / 11:.2f} ms; "
              f"fields/s at B={N}: {N / t12 * 1e3:.1f}")


if __name__ == "__main__":
    main()
