"""Multi-target correlation volumes with per-target pyramid depths.

Re-design of the reference correlation engine (/root/reference/models/
raft_utils/corr.py) around XLA/TPU strengths:

  * The all-pairs volume for ALL targets is one batched einsum —
    `(T,N,h,w,D) x (T,N,h,w,D) -> (T,N,hw,hw)` — which XLA tiles directly
    onto the MXU. Targets whose reference maps differ (events vs frames)
    are simply rows of the stacked batch; no Python-side N-to-M dispatch.
  * The variable per-target pyramid depth (e.g. levels [1,1,1,4,4]) is
    resolved at *trace time* into static target-index tuples per level,
    exactly as the reference computes them at runtime (corr.py:299-305) —
    the compiled graph has no raggedness.
  * The windowed lookup keeps the reference's channel contract: channels
    ordered level-major, then target (ascending base index), then the
    (2r+1)^2 window flattened dy-major — the ordering the released
    checkpoints' 1x1 motion-encoder conv expects.

Volumes are laid out (T, N, h1, w1, h2, w2): the query pixel axes stay
outer so the lookup gather is row-contiguous in (h2, w2).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from bflow_tpu.ops.sampler import bilinear_sample

# BFLOW_PALLAS_INTERPRET=1 runs the pallas lookup kernels in interpret
# mode, so the exact production path (incl. pallas_q8) is CI-testable
# on the CPU mesh. Test-only escape hatch: interpret mode is orders of
# magnitude slower than the compiled kernel.
_INTERPRET = os.environ.get("BFLOW_PALLAS_INTERPRET", "") == "1"

# One pyramid level: (base-target indices at this level, volume).
CorrLevel = Tuple[Tuple[int, ...], jax.Array]

# What 'auto' means on TPU. The v4 banded slab kernel (corr_lookup_v3)
# won the round-3 same-session A/B at flagship shapes: full-pyramid
# forward 9.4 vs 14.3 ms/iter (B=4, incl. ~2-3 ms dispatch overhead),
# every level individually faster, fwd+bwd 27.3 vs 30.2 ms.
_AUTO_TPU_METHOD = "pallas"


def resolve_lookup_method(method: str) -> str:
    """'auto' -> the fast path for the current backend."""
    if method == "auto":
        return (
            _AUTO_TPU_METHOD
            if jax.default_backend() == "tpu"
            else "gather"
        )
    return method


def all_pairs_correlation(
    fmap_ref: jax.Array,
    fmap_tgt: jax.Array,
    precision: str = "float32",
) -> jax.Array:
    """(T, N, h, w, D) x (T, N, hk, wk, D) -> (T, N, h, w, hk, wk) / sqrt(D).

    The target map may be spatially smaller than the reference map (the
    pooled pyramid levels correlate full-resolution queries against
    pooled target features, see build_corr_pyramid)."""
    T, N, h, w, D = fmap_ref.shape
    Tk, Nk, hk, wk, Dk = fmap_tgt.shape
    assert (Tk, Nk, Dk) == (T, N, D), (fmap_ref.shape, fmap_tgt.shape)
    a = fmap_ref.reshape(T, N, h * w, D)
    b = fmap_tgt.reshape(T, N, hk * wk, D)
    if precision == "bfloat16":
        # fast mode: bf16 operands, f32 MXU accumulation, bf16 output —
        # halves both the volume write and the per-iteration lookup
        # streaming without double-rounding the accumulation
        a = (a / jnp.sqrt(jnp.float32(D))).astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        vol = jnp.einsum("tnqd,tnkd->tnqk", a, b,
                         preferred_element_type=jnp.bfloat16)
    else:
        vol = jnp.einsum("tnqd,tnkd->tnqk", a, b,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        vol = vol / jnp.sqrt(jnp.float32(D))
    return vol.reshape(T, N, h, w, hk, wk)


def _avg_pool_2x2(vol: jax.Array) -> jax.Array:
    """2x2/stride-2 average pool over the LAST two axes, truncating odd
    trailing rows/cols (torch avg_pool2d semantics)."""
    *lead, h, w = vol.shape
    h2, w2 = h // 2, w // 2
    v = vol[..., : 2 * h2, : 2 * w2]
    v = v.reshape(*lead, h2, 2, w2, 2)
    return v.mean(axis=(-3, -1))


def level_target_indices(
    levels_per_target: Sequence[int],
) -> List[Tuple[int, ...]]:
    """Static target-index tuples per pyramid level.

    levels [1,1,1,4,4] -> [(0,1,2,3,4), (3,4), (3,4), (3,4)].
    """
    max_lvl = max(levels_per_target)
    return [
        tuple(i for i, v in enumerate(levels_per_target) if v >= lvl)
        for lvl in range(1, max_lvl + 1)
    ]


def _pad_rows16(fmap: jax.Array) -> jax.Array:
    """Zero-pad the target-map row axis of (Tl, N, h, w, D) features to a
    multiple of 16. Correlations against zero features are zero, so the
    resulting volume rows ARE grid_sample's zero padding — the pallas
    lookup kernel requires this tile-aligned layout and reads the pad
    rows instead of clamping (ops/pallas/corr_lookup_v3.py)."""
    h = fmap.shape[2]
    hp = ((h + 15) // 16) * 16
    if hp == h:
        return fmap
    return jnp.pad(fmap, ((0, 0), (0, 0), (0, hp - h), (0, 0), (0, 0)))


def build_corr_pyramid(
    fmap_ref: jax.Array,
    fmap_tgt: jax.Array,
    levels_per_target: Sequence[int],
    precision: str = "float32",
) -> List[CorrLevel]:
    """Per-level all-pairs volumes against POOLED TARGET FEATURES.

    The reference builds the full volume once and avg-pools it per level
    (corr.py:297-305). Average pooling over the target-map axes commutes
    with the dot product over the feature dim (both linear), so pooling
    the ~2 MB feature maps and re-correlating is mathematically the same
    volume — without ever streaming the ~GB level-0 volume through a
    pooling pass (measured 18 ms/fwd at B=4 vs ~1 ms this way). Odd
    trailing rows/cols truncate at each level exactly like torch
    avg_pool2d, so level shapes match the reference up to the trailing
    zero row padding: each level's target-row axis is padded to a
    multiple of 16 with all-zero correlations (= grid_sample zero
    padding, see _pad_rows16), which every lookup method treats
    identically to the unpadded map."""
    T = fmap_ref.shape[0]
    assert len(levels_per_target) == T, (levels_per_target, T)

    per_level = level_target_indices(levels_per_target)
    pyramid: List[CorrLevel] = [
        (
            per_level[0],
            all_pairs_correlation(
                fmap_ref, _pad_rows16(fmap_tgt), precision
            ),
        )
    ]
    prev_idx, prev_tgt = per_level[0], fmap_tgt
    for idx_tuple in per_level[1:]:
        sel = tuple(prev_idx.index(i) for i in idx_tuple)
        tgt = prev_tgt[jnp.asarray(sel)] if sel != tuple(
            range(len(prev_idx))
        ) else prev_tgt
        # pool the (small) UNPADDED feature maps — truncation semantics
        # must see the true rows only: (Tl, N, h, w, D) over h, w
        tgt = _avg_pool_2x2(tgt.transpose(0, 1, 4, 2, 3)).transpose(
            0, 1, 3, 4, 2
        )
        ref = fmap_ref[jnp.asarray(idx_tuple)]
        pyramid.append(
            (
                idx_tuple,
                all_pairs_correlation(ref, _pad_rows16(tgt), precision),
            )
        )
        prev_idx, prev_tgt = idx_tuple, tgt
    return pyramid


def build_pyramid_for_method(
    fmap_ref: jax.Array,
    fmap_tgt: jax.Array,
    levels_per_target: Sequence[int],
    precision: str,
    method: str,
    onehot_from_level: int = -1,
) -> List[CorrLevel]:
    """Pyramid in the volume layout the RESOLVED lookup method consumes:
    row-slab (Tl, N, h1, hp, w1*wl) for the default pallas v3 kernel
    (lane-compact in HBM — no padding waste on 80- or 62-wide maps —
    and strip-sliceable), per-query (.., hp, wl) maps otherwise. The
    slab transpose runs once per forward; the lookup runs every
    refinement iteration. Levels >= onehot_from_level (when >= 0) stay
    in per-query layout for the mixed onehot dispatch (see
    corr_lookup)."""
    pyramid = build_corr_pyramid(
        fmap_ref, fmap_tgt, levels_per_target, precision
    )
    if method in ("pallas", "pallas_q8"):
        from bflow_tpu.ops.pallas.corr_lookup_v3 import (
            quantize_volume,
            to_slab,
        )

        out = []
        for lvl, (idx, vol) in enumerate(pyramid):
            if 0 <= onehot_from_level <= lvl:
                out.append((idx, vol))  # per-query layout for onehot
                continue
            # int8 inference mode: quantize the levels that carry the
            # HBM stream (before the slab transpose, so it moves int8
            # bytes). The shallow hp=16 levels stay in the volume
            # dtype: they are <5% of the bytes and sit below the int8
            # (32, 128) sublane tile, where padding would cancel the
            # byte win.
            if method == "pallas_q8" and vol.shape[4] >= 32:
                q, scale = quantize_volume(vol)
                out.append((idx, (to_slab(q), scale)))
            else:
                out.append((idx, to_slab(vol)))
        pyramid = out
    return pyramid


def _lookup_level_gather(vol, c, radius):
    """Exact 4-corner gather (XLA gather op). Reference semantics, but
    slow on TPU: lowers to scalar-core gathers (~200 ms/iter at DSEC val
    resolution). Used on CPU and as the numerics oracle."""
    Tl, N, h1, w1, _ = c.shape
    hl, wl = vol.shape[-2:]
    r = radius
    win = 2 * r + 1
    dy, dx = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=c.dtype),
        jnp.arange(-r, r + 1, dtype=c.dtype),
        indexing="ij",
    )
    delta = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (win^2, 2)
    pts = c[..., None, :] + delta
    flat_vol = vol.reshape(Tl * N * h1 * w1, hl, wl)
    flat_pts = pts.reshape(Tl * N * h1 * w1, win * win, 2)
    feat = bilinear_sample(flat_vol, flat_pts)
    return feat.reshape(Tl, N, h1, w1, win * win)


def _lookup_level_onehot(vol, c, radius, precision):
    """Windowed bilinear lookup as two batched one-hot matmuls (MXU).

    Every query needs the (2r+2)x(2r+2) integer patch around floor(c) of
    its own (hl, wl) correlation map; the patch is extracted as
    EY @ V @ EX^T with one-hot row/column selectors, then the four
    corner-shifted (2r+1)^2 windows are blended with the fractional
    weights. One-hot rows for out-of-range indices are all-zero, which
    reproduces grid_sample's zero padding exactly. ~100x faster than the
    gather lowering on TPU because the work lands on the MXU.
    """
    Tl, N, h1, w1, _ = c.shape
    hl, wl = vol.shape[-2:]
    r = radius
    p = 2 * r + 2  # patch side

    x = c[..., 0]
    y = c[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None, None]  # (Tl,N,h1,w1,1,1)
    fy = (y - y0)[..., None, None]

    # offsets of patch rows/cols relative to floor(c): [-r, r+1]
    offs = jnp.arange(-r, r + 2, dtype=jnp.int32)  # (p,)
    ry = y0.astype(jnp.int32)[..., None] + offs  # (Tl,N,h1,w1,p)
    rx = x0.astype(jnp.int32)[..., None] + offs

    iy = jax.lax.broadcasted_iota(jnp.int32, (hl,), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (wl,), 0)
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    ey = (ry[..., None] == iy).astype(dtype)  # (Tl,N,h1,w1,p,hl)
    ex = (rx[..., None] == ix).astype(dtype)  # (Tl,N,h1,w1,p,wl)

    v = vol.astype(dtype)
    prec = None if precision == "bfloat16" else jax.lax.Precision.HIGHEST
    t1 = jnp.einsum("tnijah,tnijhw->tnijaw", ey, v, precision=prec,
                    preferred_element_type=jnp.float32)
    patch = jnp.einsum("tnijaw,tnijbw->tnijab", t1, ex.astype(t1.dtype),
                       precision=prec, preferred_element_type=jnp.float32)

    win = 2 * r + 1
    out = (
        (1 - fy) * (1 - fx) * patch[..., :win, :win]
        + (1 - fy) * fx * patch[..., :win, 1:]
        + fy * (1 - fx) * patch[..., 1:, :win]
        + fy * fx * patch[..., 1:, 1:]
    )
    return out.reshape(Tl, N, h1, w1, win * win)


def corr_lookup(
    pyramid: List[CorrLevel],
    coords: jax.Array,
    radius: int,
    method: str = "onehot",
    precision: str = "float32",
    concat: bool = True,
    onehot_from_level: int = -1,
) -> jax.Array:
    """Gather (2r+1)^2 bilinear windows around per-target query coords.

    Args:
      pyramid: output of build_corr_pyramid.
      coords: (T, N, h1, w1, 2) query positions per base target, in
        full-resolution volume pixels, (x, y) last.
      radius: window radius r.
      method: 'auto' (pallas on TPU, gather elsewhere) | 'pallas'
        (strip-mined slab kernel, TPU only — pyramid must be in slab
        layout, see build_pyramid_for_method) | 'pallas_q8' (int8
        slab, inference only: halves the per-iteration volume stream;
        deep hp=16 levels stay in the volume dtype) | 'onehot'
        (MXU matmuls; compiles slowly at scale) | 'gather' (XLA
        gather — exact oracle, fast on CPU, slow on TPU).
        Two slower pallas formulations were removed after losing
        hardware A/Bs: the round-2 block-diagonal kernel ('pallas_v2',
        removed round 5) and the round-4 rebased-band v5 (40.8 vs
        11.5 ms/iter at B=16 level 0) — history in docs/STATUS.md and
        commits b73bb03/58a9d17.
      precision: 'float32' | 'bfloat16' for the onehot matmuls.

      onehot_from_level: when >= 0 and the method is pallas/pallas_q8,
        pyramid levels >= this index dispatch to the onehot XLA path
        instead of the kernel (their volumes must be in per-query
        layout — build_pyramid_for_method with the same value). The
        deep levels are fixed-cost-bound in the kernel (tiny maps,
        same query count), while onehot einsums at those shapes fuse
        into the surrounding graph.

      concat: True -> one (N, h1, w1, C) map. False -> the per-level
        (Tl, N, h1, w1, (2r+1)^2) tensors, for consumers that contract
        the channel axis themselves (the fused motion-encoder conv,
        models/update.py) and so never need the materialized concat.

    Returns:
      (N, h1, w1, C) with C = sum over levels of |targets| * (2r+1)^2,
      channels ordered (level, target, window[dy-major]) — the reference
      contract (corr.py:307-351) — or the per-level list (concat=False,
      same channel order once flattened level-major/target/window).
    """
    T, N, h1, w1, _ = coords.shape
    method = resolve_lookup_method(method)

    # target-index tuples are static by construction; normalize to
    # plain ints (a jitted pyramid builder returns them as arrays)
    pyramid = [
        (tuple(int(i) for i in idx), vol) for idx, vol in pyramid
    ]

    out_channels: List[jax.Array] = []
    if method in ("pallas", "pallas_q8"):
        from bflow_tpu.ops.pallas.corr_lookup_v3 import (
            lookup_level_slab,
            lookup_level_slab_q8,
        )

        for lvl, (target_idx, vol) in enumerate(pyramid):
            c = coords[jnp.asarray(target_idx)] / (2.0**lvl)
            if 0 <= onehot_from_level <= lvl:
                assert not isinstance(vol, tuple) and vol.ndim == 6, (
                    "onehot_from_level needs per-query volumes "
                    "(build_pyramid_for_method with the same value)",
                    lvl)
                out_channels.append(
                    _lookup_level_onehot(
                        vol, c, radius, precision
                    ).astype(vol.dtype)
                )
                continue
            if isinstance(vol, tuple):  # (int8 slab, per-row scale)
                slab_q, scale = vol
                out_channels.append(
                    lookup_level_slab_q8(slab_q, scale, c, radius,
                                         _INTERPRET)
                )
                continue
            assert vol.ndim == 5, (
                "method='pallas' needs slab volumes "
                "(build_pyramid_for_method)", vol.shape)
            out_channels.append(
                lookup_level_slab(vol, c, radius, _INTERPRET)
            )
    else:
        for lvl, (target_idx, vol) in enumerate(pyramid):
            c = coords[jnp.asarray(target_idx)] / (2.0**lvl)
            if method == "gather":
                feat = _lookup_level_gather(vol, c, radius)
            elif method == "onehot":
                feat = _lookup_level_onehot(vol, c, radius, precision)
            else:
                raise ValueError(method)
            out_channels.append(feat)

    if not concat:
        return out_channels
    # (N, h1, w1, sum_l Tl*win^2), level-major then target then window.
    stacked = jnp.concatenate(
        [f.transpose(1, 2, 3, 0, 4).reshape(N, h1, w1, -1)
         for f in out_channels],
        axis=-1,
    )
    return stacked
