"""Strip-mined slab lookup kernel (v3) vs the gather oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from bflow_tpu.models.corr import _lookup_level_gather, build_corr_pyramid
from bflow_tpu.ops.pallas.corr_lookup_v3 import lookup_level_slab, to_slab


def _case(rng, T, N, D, h1, w1, hl, wl, r, coord_lo=-4, coord_hi_pad=3):
    a = rng.standard_normal((T, N, h1, w1, D)).astype(np.float32)
    # build a volume whose rows are zero-padded to 16 via the pyramid
    # builder contract: fabricate directly instead
    hp = ((hl + 15) // 16) * 16
    vol = rng.standard_normal((T, N, h1, w1, hl, wl)).astype(np.float32)
    volp = np.zeros((T, N, h1, w1, hp, wl), np.float32)
    volp[..., :hl, :] = vol
    coords = np.stack(
        [rng.uniform(coord_lo, wl + coord_hi_pad, (T, N, h1, w1)),
         rng.uniform(coord_lo, hl + coord_hi_pad, (T, N, h1, w1))],
        -1,
    ).astype(np.float32)
    return jnp.asarray(volp), jnp.asarray(coords)


def test_v3_forward_matches_gather(rng):
    for (T, N, h1, w1, hl, wl, r) in [
        (2, 1, 6, 16, 30, 18, 4),   # clamp top+bottom, aligned w1
        (1, 2, 5, 10, 16, 9, 2),    # hp==16 (ys always 0), padded w1
        (1, 1, 4, 7, 13, 11, 3),    # odd everything, padded w1
        (2, 1, 3, 8, 60, 20, 4),    # deep map
    ]:
        volp, coords = _case(np.random.default_rng(0), T, N, 8, h1, w1,
                             hl, wl, r)
        got = np.asarray(
            lookup_level_slab(to_slab(volp), coords, r, True)
        )
        want = np.asarray(_lookup_level_gather(volp, coords, r))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=str((T, N, h1, w1, hl, wl, r)))


def test_v3_q8_forward_matches_dequantized_oracle(rng):
    """int8 slab lookup == gather oracle run on the dequantized volume
    (the only additional error is the bf16 blend, ~0.4%)."""
    from bflow_tpu.ops.pallas.corr_lookup_v3 import (
        lookup_level_slab_q8,
        quantize_slab,
        quantize_volume,
    )

    for (T, N, h1, w1, hl, wl, r) in [
        (2, 1, 6, 16, 30, 18, 4),   # hp=32 (int8 sublane tiling)
        (1, 1, 4, 8, 60, 20, 4),    # hp=64, the flagship level-0 shape
        (1, 1, 3, 8, 46, 62, 4),    # hp=48, the MultiFlow level-0 shape
    ]:
        volp, coords = _case(np.random.default_rng(7), T, N, 8, h1, w1,
                             hl, wl, r)
        slab = to_slab(volp)
        q, scale = quantize_slab(slab)
        # quantize-then-slab (the production order, moves int8 bytes)
        # must equal slab-then-quantize: the slab's zero padding never
        # changes the per-row amax
        qv, scale_v = quantize_volume(volp)
        np.testing.assert_array_equal(np.asarray(to_slab(qv)),
                                      np.asarray(q))
        np.testing.assert_allclose(np.asarray(scale_v),
                                   np.asarray(scale), rtol=0)
        out = lookup_level_slab_q8(q, scale, coords, r, True)
        assert out.dtype == jnp.bfloat16
        got = np.asarray(out).astype(np.float32)

        # dequantize the slab and map it back to per-query volume layout
        deq = np.asarray(q, np.float32) * np.asarray(scale)[
            ..., None, None
        ]
        Tl, Nn, hh, hp, lanes = deq.shape
        w1p = ((w1 + 7) // 8) * 8
        wlp = lanes // w1p
        vol_deq = (
            deq.reshape(Tl, Nn, hh, hp, w1p, wlp)
            .transpose(0, 1, 2, 4, 3, 5)[:, :, :, :w1, :, :wl]
        )
        want = np.asarray(
            _lookup_level_gather(jnp.asarray(vol_deq), coords, r)
        )
        amax = np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=1e-2,
                                   atol=1e-2 * amax,
                                   err_msg=str((T, N, h1, w1, hl, wl, r)))


def test_v3_vjp_matches_gather(rng):
    T, N, h1, w1, hl, wl, r = 2, 1, 4, 10, 30, 14, 4
    volp, coords = _case(np.random.default_rng(1), T, N, 8, h1, w1, hl, wl, r)
    gvec = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (T, N, h1, w1, (2 * r + 1) ** 2)
        ),
        jnp.float32,
    )

    def f_ref(v, c):
        return (_lookup_level_gather(v, c, r) * gvec).sum()

    def f_v3(v, c):
        return (lookup_level_slab(to_slab(v), c, r, True) * gvec).sum()

    dv_r, dc_r = jax.grad(f_ref, argnums=(0, 1))(volp, coords)
    dv_p, dc_p = jax.grad(f_v3, argnums=(0, 1))(volp, coords)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dc_p), np.asarray(dc_r),
                               rtol=1e-4, atol=2e-4)


def test_v3_vjp_padded_queries(rng):
    # w1 % 8 != 0 exercises the padded-query skip in the dVol scatter
    T, N, h1, w1, hl, wl, r = 1, 1, 3, 7, 16, 12, 3
    volp, coords = _case(np.random.default_rng(3), T, N, 8, h1, w1, hl, wl, r)
    gvec = jnp.asarray(
        np.random.default_rng(4).standard_normal(
            (T, N, h1, w1, (2 * r + 1) ** 2)
        ),
        jnp.float32,
    )

    def f_ref(v, c):
        return (_lookup_level_gather(v, c, r) * gvec).sum()

    def f_v3(v, c):
        return (lookup_level_slab(to_slab(v), c, r, True) * gvec).sum()

    dv_r, dc_r = jax.grad(f_ref, argnums=(0, 1))(volp, coords)
    dv_p, dc_p = jax.grad(f_v3, argnums=(0, 1))(volp, coords)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dc_p), np.asarray(dc_r),
                               rtol=1e-4, atol=2e-4)

def test_v3_chunk_width_sweep(rng, monkeypatch):
    """The chunk width (queries per kernel chunk) is a pure performance
    knob — any ch dividing w1p must give identical results (fwd + VJP).
    Guards the hardware chunk-width A/Bs (scripts/exp_ch_ab.py)."""
    from bflow_tpu.ops.pallas import corr_lookup_v3 as v3

    T, N, h1, w1, hl, wl, r = 1, 1, 2, 16, 18, 18, 4
    volp, coords = _case(np.random.default_rng(5), T, N, 8, h1, w1, hl, wl, r)
    gvec = jnp.asarray(
        np.random.default_rng(6).standard_normal(
            (T, N, h1, w1, (2 * r + 1) ** 2)
        ),
        jnp.float32,
    )

    def f_v3(v, c):
        return (lookup_level_slab(to_slab(v), c, r, True) * gvec).sum()

    want = np.asarray(_lookup_level_gather(volp, coords, r))
    dv_r, dc_r = jax.grad(
        lambda v, c: (_lookup_level_gather(v, c, r) * gvec).sum(),
        argnums=(0, 1),
    )(volp, coords)

    for ch in (4, 8, 16):
        monkeypatch.setattr(v3, "pick_ch", lambda *a, ch=ch: ch)
        got = np.asarray(lookup_level_slab(to_slab(volp), coords, r, True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"ch={ch}")
        dv_p, dc_p = jax.grad(f_v3, argnums=(0, 1))(volp, coords)
        np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_r),
                                   rtol=1e-4, atol=1e-5, err_msg=f"ch={ch}")
        np.testing.assert_allclose(np.asarray(dc_p), np.asarray(dc_r),
                                   rtol=1e-4, atol=2e-4, err_msg=f"ch={ch}")
