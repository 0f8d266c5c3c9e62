"""Correlation engine vs naive NumPy/torch oracles."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from bflow_tpu.models.corr import (
    _avg_pool_2x2,
    all_pairs_correlation,
    build_corr_pyramid,
    corr_lookup,
    level_target_indices,
)


def test_level_target_indices():
    assert level_target_indices([1, 1, 1, 4]) == [
        (0, 1, 2, 3), (3,), (3,), (3,),
    ]
    assert level_target_indices([1, 1, 1, 4, 4]) == [
        (0, 1, 2, 3, 4), (3, 4), (3, 4), (3, 4),
    ]
    assert level_target_indices([2, 1]) == [(0, 1), (0,)]


def test_all_pairs_matches_numpy(rng):
    T, N, h, w, D = 3, 2, 4, 5, 16
    a = rng.standard_normal((T, N, h, w, D)).astype(np.float32)
    b = rng.standard_normal((T, N, h, w, D)).astype(np.float32)
    got = np.asarray(all_pairs_correlation(jnp.asarray(a), jnp.asarray(b)))
    want = np.einsum(
        "tnijd,tnkld->tnijkl", a, b
    ) / np.sqrt(np.float32(D))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_avg_pool_matches_torch_truncation(rng):
    # Odd spatial dims must truncate like torch avg_pool2d(2, stride=2).
    vol = rng.standard_normal((2, 15, 21)).astype(np.float32)
    got = np.asarray(_avg_pool_2x2(jnp.asarray(vol)))
    want = F.avg_pool2d(torch.from_numpy(vol)[None], 2, stride=2)[0].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def torch_reference_lookup(vols_np, coords_np, levels_per_target, radius):
    """Oracle reproducing the reference CorrBlockParallelMultiTarget
    lookup contract (corr.py:307-351): per level select targets, offset
    grid dy-major, grid_sample, concat level-major then channel-flatten.
    """
    r = radius
    T, N, h1, w1, _ = coords_np.shape
    per_level = level_target_indices(levels_per_target)
    out_parts = []
    for lvl, idx_tuple in enumerate(per_level):
        vol = vols_np[lvl]  # (Tl, N, h1, w1, hl, wl)
        Tl = len(idx_tuple)
        hl, wl = vol.shape[-2:]
        coords_sel = coords_np[list(idx_tuple)] / 2**lvl
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij")[::-1], dim=-1)
        centroid = torch.from_numpy(
            coords_sel.reshape(Tl * N * h1 * w1, 1, 1, 2)
        ).float()
        pts = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        img = torch.from_numpy(
            vol.reshape(Tl * N * h1 * w1, 1, hl, wl)
        ).float()
        xg = 2 * pts[..., 0] / (wl - 1) - 1
        yg = 2 * pts[..., 1] / (hl - 1) - 1
        grid = torch.stack([xg, yg], dim=-1)
        feat = F.grid_sample(img, grid, align_corners=True)
        out_parts.append(feat.view(Tl, N, h1, w1, -1))
    out = torch.cat(out_parts, dim=0)
    out = out.permute(1, 0, 4, 2, 3).reshape(N, -1, h1, w1)
    return out.numpy()


def test_corr_lookup_matches_reference_contract(rng):
    T, N, D = 4, 2, 8
    h = w = 12  # volume resolution
    levels = [1, 1, 2, 3]
    radius = 2
    a = rng.standard_normal((T, N, h, w, D)).astype(np.float32)
    b = rng.standard_normal((T, N, h, w, D)).astype(np.float32)

    pyramid = build_corr_pyramid(jnp.asarray(a), jnp.asarray(b), levels)
    coords = np.stack(
        [
            rng.uniform(-1, w, (T, N, h, w)),
            rng.uniform(-1, h, (T, N, h, w)),
        ],
        axis=-1,
    ).astype(np.float32)
    got = np.asarray(corr_lookup(pyramid, jnp.asarray(coords), radius))

    vols_np = [np.asarray(v) for _, v in pyramid]
    want = torch_reference_lookup(vols_np, coords, levels, radius)

    win = (2 * radius + 1) ** 2
    assert got.shape == (N, h, w, sum(levels) * win)
    np.testing.assert_allclose(
        got.transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4
    )


def test_onehot_lookup_matches_gather(rng):
    import jax.numpy as jnp

    from bflow_tpu.models.corr import corr_lookup

    T, N, D = 3, 2, 8
    h = w = 12
    levels = [1, 2, 3]
    radius = 3
    a = rng.standard_normal((T, N, h, w, D)).astype(np.float32)
    b = rng.standard_normal((T, N, h, w, D)).astype(np.float32)
    pyramid = build_corr_pyramid(jnp.asarray(a), jnp.asarray(b), levels)
    coords = np.stack(
        [rng.uniform(-3, w + 2, (T, N, h, w)),
         rng.uniform(-3, h + 2, (T, N, h, w))],
        axis=-1,
    ).astype(np.float32)

    ref = np.asarray(
        corr_lookup(pyramid, jnp.asarray(coords), radius, method="gather")
    )
    one = np.asarray(
        corr_lookup(pyramid, jnp.asarray(coords), radius, method="onehot",
                    precision="float32")
    )
    np.testing.assert_allclose(one, ref, rtol=1e-4, atol=1e-4)

    # integer coords exactly on pixels — no interpolation error at all
    icoords = np.stack(
        [rng.integers(0, w, (T, N, h, w)),
         rng.integers(0, h, (T, N, h, w))],
        axis=-1,
    ).astype(np.float32)
    ref = np.asarray(
        corr_lookup(pyramid, jnp.asarray(icoords), radius, method="gather")
    )
    one = np.asarray(
        corr_lookup(pyramid, jnp.asarray(icoords), radius, method="onehot",
                    precision="float32")
    )
    np.testing.assert_allclose(one, ref, rtol=1e-5, atol=1e-5)


def test_mixed_onehot_from_level_matches_gather(rng, monkeypatch):
    """Mixed dispatch (onehot_from_level): shallow levels through the
    pallas slab kernel (interpret mode), deep levels through the onehot
    XLA path — output must equal the gather oracle on every level and
    keep the reference channel order."""
    import jax.numpy as jnp

    from bflow_tpu.models import corr as corr_mod
    from bflow_tpu.models.corr import build_pyramid_for_method

    monkeypatch.setattr(corr_mod, "_INTERPRET", True)

    T, N, D, h, w, r = 2, 1, 8, 16, 16, 4
    levels = [1, 3]
    a = rng.standard_normal((T, N, h, w, D)).astype(np.float32)
    b = rng.standard_normal((T, N, h, w, D)).astype(np.float32)
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(-3, w + 2, (T, N, h, w)),
             rng.uniform(-3, h + 2, (T, N, h, w))],
            -1,
        ).astype(np.float32)
    )

    plain = build_corr_pyramid(jnp.asarray(a), jnp.asarray(b), levels)
    want = np.asarray(corr_lookup(plain, coords, r, method="gather"))

    for method in ("pallas", "pallas_q8"):
        mixed = build_pyramid_for_method(
            jnp.asarray(a), jnp.asarray(b), levels,
            precision="float32", method=method, onehot_from_level=1,
        )
        # level 0 in slab (or quantized-slab) layout, deeper per-query
        assert (isinstance(mixed[0][1], tuple)
                or mixed[0][1].ndim == 5), method
        assert all(v.ndim == 6 for _, v in mixed[1:])
        got = np.asarray(
            corr_lookup(mixed, coords, r, method=method,
                        onehot_from_level=1)
        )
        tol = 2e-2 if method == "pallas_q8" else 1e-4
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
