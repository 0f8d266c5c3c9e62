"""v5 rebased-band lookup kernel vs the gather oracle.

v5 (ops/pallas/corr_lookup_v5.py) DMAs a K=32-row rebased band per
chunk instead of streaming the full hp rows; these tests pin its
exactness on the shapes it accepts (32 < hp <= 64), including the
tall-spread fallback branch, padded query rows, the q8 mode and the
custom-VJP pairing with the v4 backward.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bflow_tpu.models.corr import _lookup_level_gather
from bflow_tpu.ops.pallas.corr_lookup_v3 import to_slab
from bflow_tpu.ops.pallas.corr_lookup_v5 import (
    K_BAND,
    lookup_level_slab_q8_v5,
    lookup_level_slab_v5,
    supports,
)


def _case(rng, T, N, h1, w1, hl, wl, r, y_spread=None):
    hp = ((hl + 15) // 16) * 16
    vol = rng.standard_normal((T, N, h1, w1, hl, wl)).astype(np.float32)
    volp = np.zeros((T, N, h1, w1, hp, wl), np.float32)
    volp[..., :hl, :] = vol
    if y_spread is None:
        ys = rng.uniform(-4, hl + 3, (T, N, h1, w1))
    else:
        # per-row base + bounded in-row spread: controls how often the
        # tall-spread fallback branch fires
        base = rng.uniform(0, hl - y_spread, (T, N, h1, 1))
        ys = base + rng.uniform(0, y_spread, (T, N, h1, w1))
    coords = np.stack(
        [rng.uniform(-4, wl + 3, (T, N, h1, w1)), ys], -1
    ).astype(np.float32)
    return jnp.asarray(volp), jnp.asarray(coords), hp


def test_v5_supports_gate():
    assert supports(16, 4)  # hp <= K: whole band in one block
    assert supports(32, 4)
    assert supports(48, 4)
    assert supports(64, 4)
    assert not supports(80, 4)
    assert not supports(64, 8)  # window + slack exceeds one block
    assert supports(32, 8)  # hp <= K is radius-independent


def test_v5_forward_matches_gather():
    for (T, N, h1, w1, hl, wl, r, spread) in [
        (1, 1, 4, 8, 60, 20, 4, None),   # hp=64, full-range coords
        (2, 1, 6, 16, 60, 18, 4, 3.0),   # smooth rows (fallback off)
        (1, 1, 4, 7, 46, 11, 3, None),   # hp=48, padded w1
        (1, 2, 3, 8, 33, 9, 4, None),    # hp=48 boundary, small map
        (1, 1, 2, 8, 64, 10, 4, 60.0),   # max spread (fallback-heavy)
        (1, 2, 5, 10, 16, 9, 2, None),   # hp=16 deep level, padded w1
        (2, 1, 6, 16, 30, 18, 4, None),  # hp=32 mid level
    ]:
        volp, coords, hp = _case(
            np.random.default_rng(0), T, N, h1, w1, hl, wl, r, spread
        )
        assert supports(hp, r), (hp, r)
        got = np.asarray(
            lookup_level_slab_v5(to_slab(volp), coords, r, True)
        )
        want = np.asarray(_lookup_level_gather(volp, coords, r))
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-5,
            err_msg=str((T, N, h1, w1, hl, wl, r, spread)),
        )


def test_v5_matches_v4():
    from bflow_tpu.ops.pallas.corr_lookup_v3 import lookup_level_slab

    volp, coords, _ = _case(
        np.random.default_rng(3), 2, 1, 4, 16, 60, 20, 4
    )
    slab = to_slab(volp)
    got5 = np.asarray(lookup_level_slab_v5(slab, coords, 4, True))
    got4 = np.asarray(lookup_level_slab(slab, coords, 4, True))
    np.testing.assert_allclose(got5, got4, rtol=1e-5, atol=1e-6)


def test_v5_q8_matches_dequantized_oracle():
    from bflow_tpu.ops.pallas.corr_lookup_v3 import quantize_volume

    T, N, h1, w1, hl, wl, r = 1, 1, 4, 8, 60, 20, 4
    volp, coords, _ = _case(
        np.random.default_rng(7), T, N, h1, w1, hl, wl, r
    )
    q, scale = quantize_volume(volp)
    out = lookup_level_slab_q8_v5(to_slab(q), scale, coords, r, True)
    assert out.dtype == jnp.bfloat16
    got = np.asarray(out).astype(np.float32)

    deq = np.asarray(q, np.float32) * np.asarray(scale)[
        ..., None, None, None
    ]
    want = np.asarray(_lookup_level_gather(jnp.asarray(deq), coords, r))
    amax = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2 * amax)


def test_v5_vjp_matches_gather():
    """v5 forward pairs with the v4 backward through the custom VJP."""
    T, N, h1, w1, hl, wl, r = 2, 1, 4, 10, 40, 14, 4
    volp, coords, _ = _case(
        np.random.default_rng(1), T, N, h1, w1, hl, wl, r
    )
    gvec = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (T, N, h1, w1, (2 * r + 1) ** 2)
        ),
        jnp.float32,
    )

    def f_ref(v, c):
        return (_lookup_level_gather(v, c, r) * gvec).sum()

    def f_v5(v, c):
        return (lookup_level_slab_v5(to_slab(v), c, r, True) * gvec).sum()

    dv_r, dc_r = jax.grad(f_ref, argnums=(0, 1))(volp, coords)
    dv_p, dc_p = jax.grad(f_v5, argnums=(0, 1))(volp, coords)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dc_p), np.asarray(dc_r),
                               rtol=1e-4, atol=2e-4)


def test_v5_fallback_flag_stats():
    """Sanity on the host-side bounds: smooth flow triggers almost no
    fallback chunks; the flag goes up exactly when a window exceeds
    the K-row block."""
    from bflow_tpu.ops.pallas.corr_lookup_v5 import _chunk_bounds

    rng = np.random.default_rng(5)
    tn, h1, w1, hp, r = 4, 8, 32, 64, 4
    base = rng.uniform(10, 40, (tn, h1, 1))
    y = base + rng.uniform(0, 2.0, (tn, h1, w1))  # spread 2 px
    coords = jnp.asarray(
        np.stack([rng.uniform(0, 60, (tn, h1, w1)), y], -1), jnp.float32
    )
    y0, need2 = _chunk_bounds(coords, r, w1, 8, hp)
    assert int(np.asarray(need2).sum()) == 0
    y0 = np.asarray(y0)
    assert ((y0 % 16 == 0) & (y0 >= 0) & (y0 <= hp - K_BAND)).all()

    # force one tall chunk
    y2 = np.asarray(y).copy()
    y2[0, 0, 0] = 1.0
    y2[0, 0, 1] = 60.0
    coords2 = jnp.asarray(
        np.stack([np.asarray(coords)[..., 0], y2], -1), jnp.float32
    )
    _, need2b = _chunk_bounds(coords2, r, w1, 8, hp)
    assert int(np.asarray(need2b)[0, 0, 0]) == 1
