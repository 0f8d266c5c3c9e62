"""Pallas TPU kernel v4: banded windowed bilinear correlation lookup.

Lookup for the RAFT window op (reference: /root/reference/models/
raft_utils/corr.py:307-351): every query pixel owns a private (hl, wl)
correlation map and reads one bilinear (2r+1)^2 window around its
(x, y) coordinate, grid_sample zero padding outside the map.

Design history (round 3). The r2 kernel (corr_lookup.py) spends
~35 ns/query, bound by a balanced mix of MXU junk work (each chunk
contraction computes every query's taps against all 8 chunk-mates'
maps) and per-query VPU work (strip copies, block-diagonal assembly,
window writes). Two round-3 variants were measured on hardware:
strips pulled per query via dynamic-sublane slices (VPU-bound, ~par
with r2) and scalar-predicated static copies (2x slower — branch
overhead). The winning structure eliminates per-query data movement on
the INPUT side entirely:

  * Volume layout — "row slab": (Tl, N, h1, hp, w1p*wlp). For each
    query-grid row i, a slab whose sublanes are the map row y and
    whose lanes are (query j, map column x), with the per-query band
    padded to wlp = roundup(wl, 16) zero columns and hp = roundup(hl,
    16) zero rows (zero-padded FEATURES make the pad correlations
    exact grid_sample zero padding). Lane-compact minor dim kills the
    1.6-2.1x HBM padding of the r2 (.., hp, wl) layout.
  * Per 8-query chunk, the y-blend contracts the slab columns
    DIRECTLY — no strip copies, no alignment games, nothing dynamic:
      EY2 (128, hp)   absolute-position y-hat taps   (4 VPU ops)
      R'  = EY2 @ V[:, chunk lanes]    (hp, 8*wlp)   (MXU)
    R' holds each query's y-blended rows in its own 16-aligned lane
    band; off-band values are junk that is never read.
  * Band gather: 8 aligned (16, wlp) copies assemble S2 (128, wlp),
    then OUT = S2 @ ExT[:, chunk] ((wlp, 128) x-hat taps, built once
    per row) and the (win, win) diagonal blocks stream out.

Per chunk that is ~2 small contractions + 8 aligned vreg copies + one
(128, hp) selector build — about half the r2 MXU work and a third of
its VPU work, with no dynamic indexing anywhere.

Backward (custom VJP), same structure transposed:
    dS2  = Gbd @ ExN[chunk]            (128, wlp)
    dR'  = place bands of dS2          (zero background written once)
    dV   = EY2T @ dR'                  full (hp, 8*wlp) STATIC store
    P_x  = S2 @ dExT[:, chunk];  dx = rowsum(Gbd o P_x) group-sum
    P_y  = bands(dEY2 @ V) @ ExT[:, chunk];  dy likewise
dV writes every chunk's full lane band once — no read-modify-write, no
zero-fill of the output, no collisions (padded queries q >= w1 own
their own zero bands).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWPAD = 16  # slab row padding: hp = roundup(hl, 16)
COLPAD = 16  # per-query band padding: wlp = roundup(wl, 16)
WINP = 16  # tap stride per query

_FAR = -1.0e6  # tap position with zero hat weight everywhere


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_ch(w1: int, wlp: int) -> int:
    """Queries per kernel chunk. Per-chunk fixed costs (matmul issue,
    loop bookkeeping) dominate the small pyramid levels; the measured
    same-session A/B (scripts/exp_ch_ab.py, v5e) says the wider
    16-query chunk wins ONLY on the deepest levels (wlp == 16:
    1.60 -> 0.85 ms/iter) and loses on every wider level. Only pick 16
    when it does not change w1p, so the slab layout is ch-independent
    and (w1, lanes) alone determine the chunking."""
    if wlp == 16 and _round_up(w1, 16) == _round_up(w1, 8):
        return 16
    return 8


def _resolve_chunking(w1: int, lanes: int):
    """(w1, lanes) -> (ch, w1p, wlp), consistent with to_slab."""
    w1p = _round_up(w1, 8)
    assert lanes % w1p == 0, (w1, lanes)
    wlp = lanes // w1p
    return pick_ch(w1, wlp), w1p, wlp


def _precision(dt):
    # f32 volumes need HIGHEST (a single-pass bf16 MXU product would
    # round the correlation values); bf16 volumes take the fast pass.
    return (
        jax.lax.Precision.HIGHEST
        if dt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _hat(pos, n, axis):
    """Bilinear tap weights relu(1 - |pos - grid|) (grid_sample blend;
    zero outside the map). pos is (1, W) [axis=0 -> (n, W)] or (W, 1)
    [axis=1 -> (W, n)] so each MXU consumer gets its canonical
    orientation without in-kernel transposes."""
    shape = (n, pos.shape[-1]) if axis == 0 else (pos.shape[0], n)
    g = jax.lax.broadcasted_iota(jnp.int32, shape, axis).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - g))


def _dhat(pos, n, axis):
    """d(hat)/d(pos): [grid == floor(pos)+1] - [grid == floor(pos)]."""
    shape = (n, pos.shape[-1]) if axis == 0 else (pos.shape[0], n)
    g = jax.lax.broadcasted_iota(jnp.int32, shape, axis).astype(jnp.float32)
    f = jnp.floor(pos)
    return (g == f + 1.0).astype(jnp.float32) - (g == f).astype(jnp.float32)


# --------------------------------------------------------------------------
# forward (v6: y-hat matmul + per-query dynamic-roll x extraction)
# --------------------------------------------------------------------------
#
# The v4 forward spends its time on per-chunk issue structure, not bytes
# (q8 halved the HBM stream and LOST 12%, docs/STATUS.md r4): per 8-query
# chunk it does 8 band-gather copies, a (wlp, w1p*WINP) x-hat build per
# row, a second MXU contraction, and 8 diagonal-pack copies. v6 keeps the
# y side exactly as v4 (the EY2 @ slab contraction handles fractional y
# AND grid_sample zero padding via the hat weights + zero pad rows) and
# replaces the whole x side with:
#
#   * one dynamic cyclic lane roll per query: the query's (WINP, wlp)
#     y-blended band rolled so lane i holds map column (floor(x)-r+i)
#     mod wlp. Valid taps never wrap (their positions lie in [0, wl));
#     wrapped lanes are exactly the out-of-map taps, which the
#     host-precomputed lerp weights zero out;
#   * one fused masked x-lerp per chunk on the packed (WINP, ch*WINP)
#     tile: out = P * WX0 + roll(P, -1) * WX1, with
#     WX0[m] = (1-fx) * [0 <= x0-r+m < wl] and
#     WX1[m] = fx * [0 <= x0-r+m+1 < wl] built on the host.
#
# No x-hat build, no second matmul, no band gather, no diagonal pack.
# The backward pass is shared with v4 (_bwd_impl re-derives everything
# from vol + coords + cotangent), so v6 slots under the same custom VJP.


def _fwd_kernel_v6(
    *refs, w1p, win, hp, wlp, ri, ch, quant=False, parity=False,
):
    (sx_ref, xw_ref, yc_ref, vol_ref, out_ref, d_scr, d_scr2) = refs
    dt = jnp.bfloat16 if quant else vol_ref.dtype
    prec = _precision(dt)
    nch = w1p // ch
    cb = ch * wlp
    cw = ch * WINP

    def yblend(rl, c):
        yv = yc_ref[0, rl, :, c : c + 1]  # (cw, 1) abs y taps
        ey2 = _hat(yv, hp, 1)  # (cw, hp)
        band = vol_ref[0, rl, :, c * cb : (c + 1) * cb]
        if quant:
            band = band.astype(dt)
        ey2 = ey2.astype(dt)
        return jax.lax.dot_general(
            ey2, band,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)

    # depth-1 software pipeline, parity scratch — same schedule as v4
    rp = yblend(0, 0)
    for rl in range(ri):
        for c in range(nch):
            par = (rl * nch + c) % 2 if parity else 0
            dv = d_scr2 if par else d_scr
            nrl, nc = (rl, c + 1) if c + 1 < nch else (rl + 1, 0)
            rp_next = yblend(nrl, nc) if nrl < ri else None
            for ql in range(ch):
                q = c * ch + ql
                sx = sx_ref[0, rl, q]
                strip = rp[
                    ql * WINP : (ql + 1) * WINP,
                    ql * wlp : (ql + 1) * wlp,
                ]
                rolled = pltpu.roll(strip, sx, axis=1)
                dv[:, ql * WINP : (ql + 1) * WINP] = rolled[:, :WINP]
            wx0 = xw_ref[0, rl, 0:1, c * cw : (c + 1) * cw].astype(dt)
            wx1 = xw_ref[0, rl, 1:2, c * cw : (c + 1) * cw].astype(dt)
            t = dv[:]
            # shift-left-by-1 as a non-negative cyclic roll; the wrap
            # crosses query groups only at lane 15 of each group, which
            # the (win, win) unpack never reads (win <= 15)
            tl1 = pltpu.roll(t, cw - 1, axis=1)
            out_ref[0, rl, c] = t * wx0 + tl1 * wx1
            rp = rp_next


def _prep_positions_v6(coords, radius, w1p, ch, wlp, wl, wdt):
    """Host-side prep for the v6 kernel. coords: (TN, h1, w1, 2). Returns
      sx (TN, h1, w1p) int32 SMEM — cyclic roll shift per query, chosen
        so rolled lane i holds map column (floor(x)-r+i) mod wlp;
      xw (TN, h1, 2, w1p*WINP) — masked x-lerp weight rows WX0/WX1
        (zero outside the map and for padded queries: grid_sample zero
        padding lands entirely in these weights);
      yc (TN, h1, ch*WINP, nch) f32 — absolute y tap positions, as v4.
    """
    tn, h1, w1, _ = coords.shape
    offs = jnp.arange(WINP, dtype=jnp.float32) - float(radius)
    x = coords[..., 0]
    x0 = jnp.floor(x)
    fx = (x - x0)[..., None]  # (TN, h1, w1, 1)
    pos = x0[..., None] + offs  # (TN, h1, w1, WINP) tap positions
    in0 = ((pos >= 0.0) & (pos <= wl - 1)).astype(jnp.float32)
    pos1 = pos + 1.0
    in1 = ((pos1 >= 0.0) & (pos1 <= wl - 1)).astype(jnp.float32)
    wx0 = (1.0 - fx) * in0
    wx1 = fx * in1
    bx = x0.astype(jnp.int32) - radius
    sx = jnp.remainder(-bx, wlp).astype(jnp.int32)

    yl = coords[..., 1:2] + offs
    if w1p != w1:
        pad3 = ((0, 0), (0, 0), (0, w1p - w1), (0, 0))
        wx0 = jnp.pad(wx0, pad3)
        wx1 = jnp.pad(wx1, pad3)
        yl = jnp.pad(yl, pad3, constant_values=_FAR)
        sx = jnp.pad(sx, ((0, 0), (0, 0), (0, w1p - w1)))
    xw = jnp.stack(
        [wx0.reshape(tn, h1, w1p * WINP),
         wx1.reshape(tn, h1, w1p * WINP)],
        axis=2,
    ).astype(wdt)
    nch = w1p // ch
    yc = yl.reshape(tn, h1, nch, ch * WINP).transpose(0, 1, 3, 2)
    return sx, xw, yc


def _fwd_kernel(
    *refs, w1p, win, hp, wlp, ri, ch, quant=False, parity=False,
    q8_pipe=False,
):
    (xp_ref, yc_ref, vol_ref, out_ref,
     s2_scr, s2_scr2, d_scr, d_scr2) = refs
    if quant:
        # int8 volume (see quantize_slab): the band is cast to bf16 at
        # the point of contraction (values <= 127 are exact in bf16),
        # so the blend numerics stay bf16-grade. The per-row dequant
        # scale is NOT threaded through the kernel — the caller folds
        # it into the packed output with one fused XLA multiply
        # (_fwd_impl), which keeps the blend in the exact integer
        # domain and avoids SMEM block-shape pitfalls entirely (a
        # 3-D SMEM scale block compiled but read garbage on real v5e
        # hardware, round-4 verify_kernels run).
        dt = jnp.bfloat16
    else:
        dt = vol_ref.dtype
    prec = _precision(dt)
    nch = w1p // ch
    cb = ch * wlp  # chunk band lanes
    cw = ch * WINP  # chunk tap lanes

    def yblend(rl, c):
        # y-blend straight off the slab: no per-query input movement
        yv = yc_ref[0, rl, :, c : c + 1]  # (cw, 1) abs y taps
        ey2 = _hat(yv, hp, 1)  # (cw, hp)
        band = vol_ref[0, rl, :, c * cb : (c + 1) * cb]
        if quant:
            band = band.astype(dt)
        ey2 = ey2.astype(dt)
        return jax.lax.dot_general(
            ey2, band,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)

    # software pipeline (depth 1): chunk c+1's y-blend contraction is
    # issued before chunk c's VPU-side band gather / window packing
    # consumes rp, so the MXU stays busy under the vector work.
    # The round-4 "int8 pipelining hazard" (corrupt cells at row/chunk
    # boundaries on real v5e) was in fact a data race through the
    # SHARED s2/d scratch: with parity-alternating buffers the race is
    # structurally gone — on-chip q8+pipe+parity is bit-exact vs the
    # unpipelined path AND 1.7x faster (4.26 -> 2.53 ms/iter at the
    # TN=20 flagship level 0, scripts/exp_v4_knobs.py). int8 therefore
    # pipelines exactly when parity scratch is on (the default).
    pipelined = (not quant) or parity or q8_pipe
    rp = yblend(0, 0) if pipelined else None
    for rl in range(ri):
        exT = _hat(xp_ref[0, rl], wlp, 0).astype(dt)  # (wlp, w1p*WINP)
        for c in range(nch):
            # parity mode: alternate scratch buffers so mosaic may
            # overlap adjacent chunks' MXU and VPU phases instead of
            # serializing on the shared s2/d buffers (A/B knob).
            # Two separate buffers, picked at trace time — a leading
            # dynamic index into a 3-D VMEM scratch fails mosaic's
            # memref_slice lowering.
            par = (rl * nch + c) % 2 if parity else 0
            s2v = s2_scr2 if par else s2_scr
            dv = d_scr2 if par else d_scr
            if pipelined:
                nrl, nc = (rl, c + 1) if c + 1 < nch else (rl + 1, 0)
                rp_next = yblend(nrl, nc) if nrl < ri else None
            else:
                rp, rp_next = yblend(rl, c), None
            # gather each query's 16-aligned lane band
            for ql in range(ch):
                s2v[ql * WINP : (ql + 1) * WINP, :] = rp[
                    ql * WINP : (ql + 1) * WINP,
                    ql * wlp : (ql + 1) * wlp,
                ]
            out = jax.lax.dot_general(
                s2v[:], exT[:, c * cw : (c + 1) * cw],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            # diagonal (16, 16) blocks -> one packed (16, cw) tile:
            # sublane-only shifts + a single aligned store (the naive
            # per-query (9, 9) sub-tile writes dominated the kernel)
            for ql in range(ch):
                s = ql * WINP
                dv[:, s : s + WINP] = out[s : s + WINP, s : s + WINP
                                          ].astype(dt)
            out_ref[0, rl, c] = dv[:]
            rp = rp_next


def _unpack_windows(packed, w1, win, ch):
    """(TN, h1, nch, WINP, ch*WINP) diagonal-packed tiles ->
    (TN, h1, w1, win, win) windows (one fused XLA copy)."""
    tn, h1, nch = packed.shape[:3]
    x = packed.reshape(tn, h1, nch, WINP, ch, WINP)
    x = x.transpose(0, 1, 2, 4, 3, 5).reshape(
        tn, h1, nch * ch, WINP, WINP
    )
    return x[:, :, :w1, :win, :win]


def _pack_windows(g, w1p, win, ch):
    """(TN, h1, w1, win, win) cotangents -> diagonal-packed
    (TN, h1, nch, WINP, ch*WINP) tiles (inverse of _unpack_windows)."""
    tn, h1, w1 = g.shape[:3]
    g = jnp.pad(
        g,
        ((0, 0), (0, 0), (0, w1p - w1),
         (0, WINP - win), (0, WINP - win)),
    )
    x = g.reshape(tn, h1, w1p // ch, ch, WINP, WINP)
    return x.transpose(0, 1, 2, 4, 3, 5).reshape(
        tn, h1, w1p // ch, WINP, ch * WINP
    )


def _prep_positions(coords, radius, w1p, ch):
    """Host-side tap precomputation. coords: (TN, h1, w1, 2). Returns
      xp (TN, h1, 1, w1p*WINP) f32 — x tap positions (band-local),
      yc (TN, h1, ch*WINP, nch) f32 — absolute y tap positions, one
        (ch*WINP,) column per chunk.
    A naive (.., W, 1) column tensor gets its unit minor dim padded to
    128 lanes in HBM (hundreds of MB per call at flagship shapes); the
    chunk-column layout keeps it ~W*128/W1P bytes and the kernel slices
    a ready-made (ch*WINP, 1) column per chunk. Padded queries (w1..w1p)
    get _FAR positions (zero hat weight)."""
    tn, h1, w1, _ = coords.shape
    offs = jnp.arange(WINP, dtype=jnp.float32) - float(radius)
    xp = coords[..., 0:1] + offs  # (TN, h1, w1, WINP)
    yl = coords[..., 1:2] + offs
    if w1p != w1:
        pad = ((0, 0), (0, 0), (0, w1p - w1), (0, 0))
        xp = jnp.pad(xp, pad, constant_values=_FAR)
        yl = jnp.pad(yl, pad, constant_values=_FAR)
    nch = w1p // ch
    yc = yl.reshape(tn, h1, nch, ch * WINP).transpose(0, 1, 3, 2)
    return xp.reshape(tn, h1, 1, w1p * WINP), yc


def _row_spec(ri, w):
    return pl.BlockSpec(
        (1, ri, 1, w), lambda t, i: (t, i, 0, 0), memory_space=pltpu.VMEM
    )


def _col_spec(ri, w):
    return pl.BlockSpec(
        (1, ri, w, 1), lambda t, i: (t, i, 0, 0), memory_space=pltpu.VMEM
    )


def _chunkcol_spec(ri, nch, ch):
    return pl.BlockSpec(
        (1, ri, ch * WINP, nch),
        lambda t, i: (t, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _slab_spec(ri, hp, lanes):
    return pl.BlockSpec(
        (1, ri, hp, lanes),
        lambda t, i: (t, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


_VMEM_BUDGET = 2_500_000


def _pick_ri(h1, per_row_bytes, ri=None):
    """Rows per program: amortize grid overhead on small levels while
    keeping the (double-buffered) working set well inside VMEM."""
    if ri is not None:
        assert h1 % ri == 0, (h1, ri)
        return ri
    for cand in (6, 5, 4, 3, 2):
        if h1 % cand == 0 and cand * per_row_bytes < _VMEM_BUDGET:
            return cand
    return 1


def _fwd_impl(vol, coords, radius, interpret, ri_override=None,
              scale=None, wl=None):
    Tl, N, h1, hp, lanes = vol.shape
    w1 = coords.shape[3]
    ch, w1p, wlp = _resolve_chunking(w1, lanes)
    assert hp % ROWPAD == 0 and wlp % COLPAD == 0, vol.shape
    win = 2 * radius + 1
    assert 2 * radius + 2 <= WINP, radius
    quant = scale is not None
    out_dt = jnp.bfloat16 if quant else vol.dtype

    volr = vol.reshape(Tl * N, h1, hp, lanes)
    ri = _pick_ri(h1, hp * lanes * vol.dtype.itemsize, ri_override)

    # Parity-alternating scratch is the measured default (bf16 -7%,
    # and it makes the pipelined int8 path race-free — see the
    # pipeline note in _fwd_kernel). BFLOW_V4_PARITY=0 restores the
    # shared-scratch schedule; BFLOW_Q8_PIPE=1 then force-pipelines
    # int8 WITHOUT parity, which reproduces the round-4 corruption
    # (kept strictly as the regression repro for exp_v4_knobs.py).
    parity = os.environ.get("BFLOW_V4_PARITY", "1") == "1"
    q8_pipe = os.environ.get("BFLOW_Q8_PIPE", "") == "1"
    use_v6 = os.environ.get("BFLOW_LOOKUP_V6", "0") == "1"

    nch = w1p // ch
    if use_v6:
        # x-tap zero padding needs the TRUE map width; the slab's zero
        # pad columns [wl, wlp) are equivalent, so wlp is a safe
        # default when the caller does not thread wl through.
        sx, xw, yc = _prep_positions_v6(
            coords.reshape(Tl * N, h1, w1, 2), radius, w1p, ch, wlp,
            wl if wl is not None else wlp,
            jnp.float32 if vol.dtype == jnp.float32 else jnp.bfloat16,
        )
        packed = pl.pallas_call(
            functools.partial(
                _fwd_kernel_v6, w1p=w1p, win=win, hp=hp, wlp=wlp,
                ri=ri, ch=ch, quant=quant, parity=parity,
            ),
            grid=(Tl * N, h1 // ri),
            in_specs=[
                pl.BlockSpec(
                    (1, ri, w1p), lambda t, i: (t, i, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, ri, 2, w1p * WINP), lambda t, i: (t, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                _chunkcol_spec(ri, nch, ch),
                _slab_spec(ri, hp, lanes),
            ],
            out_specs=pl.BlockSpec(
                (1, ri, nch, WINP, ch * WINP),
                lambda t, i: (t, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (Tl * N, h1, nch, WINP, ch * WINP), out_dt
            ),
            scratch_shapes=[
                pltpu.VMEM((WINP, ch * WINP), out_dt),
                pltpu.VMEM((WINP, ch * WINP), out_dt),
            ],
            interpret=interpret,
        )(sx, xw, yc, volr)
        if quant:
            sc = scale.reshape(Tl * N, h1, 1, 1, 1).astype(packed.dtype)
            packed = packed * sc
        out = _unpack_windows(packed, w1, win, ch)
        return out.reshape(Tl, N, h1, w1, win * win)

    xp, yc = _prep_positions(
        coords.reshape(Tl * N, h1, w1, 2), radius, w1p, ch
    )
    in_specs = [
        _row_spec(ri, w1p * WINP),
        _chunkcol_spec(ri, nch, ch),
        _slab_spec(ri, hp, lanes),
    ]
    operands = [xp, yc, volr]

    packed = pl.pallas_call(
        functools.partial(
            _fwd_kernel, w1p=w1p, win=win, hp=hp, wlp=wlp, ri=ri, ch=ch,
            quant=quant, parity=parity, q8_pipe=q8_pipe,
        ),
        grid=(Tl * N, h1 // ri),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, ri, nch, WINP, ch * WINP),
            lambda t, i: (t, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (Tl * N, h1, nch, WINP, ch * WINP), out_dt
        ),
        scratch_shapes=[
            pltpu.VMEM((ch * WINP, wlp), out_dt),
            pltpu.VMEM((ch * WINP, wlp), out_dt),
            pltpu.VMEM((WINP, ch * WINP), out_dt),
            pltpu.VMEM((WINP, ch * WINP), out_dt),
        ],
        interpret=interpret,
    )(*operands)

    if quant:
        # per-row dequant: one XLA multiply fused into the unpack copy.
        # Stays in bf16 — an f32 upcast of the packed output is a
        # ~400 MB temp per level at B=16 (part of the round-4 bench_q8
        # OOM); the bf16 scale rounding (~0.4%) matches the int8
        # quantization step's own error.
        sc = scale.reshape(Tl * N, h1, 1, 1, 1).astype(packed.dtype)
        packed = packed * sc
    out = _unpack_windows(packed, w1, win, ch)
    return out.reshape(Tl, N, h1, w1, win * win)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(
    xr_ref, xc_ref, yc_ref, yr_ref, vol_ref, g_ref,
    dvol_ref, dxy_ref, s2_scr, g_scr, dr_scr, *, w1p, win, hp, wlp, ri,
    ch,
):
    dt = vol_ref.dtype
    prec = _precision(dt)
    nch = w1p // ch
    cb = ch * wlp
    cw = ch * WINP

    # group-sum: row q sums its WINP-tap strip of a (cw,) column
    gs = (
        jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1) // WINP
        == jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0)
    ).astype(jnp.float32)

    # off-band/off-diagonal backgrounds are written once; every chunk
    # overwrites the same band/diagonal positions
    g_scr[...] = jnp.zeros_like(g_scr)
    dr_scr[...] = jnp.zeros_like(dr_scr)

    def dot(a, b, p=prec):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=p,
        )

    for rl in range(ri):
        exT = _hat(xr_ref[0, rl], wlp, 0).astype(dt)  # (wlp, W)
        dexT = _dhat(xr_ref[0, rl], wlp, 0).astype(dt)
        for c in range(nch):
            yv = yc_ref[0, rl, :, c : c + 1]  # (cw, 1)
            yr = yr_ref[0, rl, :, c * cw : (c + 1) * cw]  # (1, cw)
            xv = xc_ref[0, rl, :, c : c + 1]  # (cw, 1)
            ey2 = _hat(yv, hp, 1).astype(dt)  # (cw, hp)
            dey2 = _dhat(yv, hp, 1).astype(dt)
            ey2T = _hat(yr, hp, 0).astype(dt)  # (hp, cw)
            exN = _hat(xv, wlp, 1).astype(dt)  # (cw, wlp) chunk-built
            vband = vol_ref[0, rl, :, c * cb : (c + 1) * cb]

            # Gbd from the packed (WINP, cw) cotangent tile:
            # per-query sublane-only shifts (lane positions unchanged)
            gtile = g_ref[0, rl, c].astype(dt)
            for ql in range(ch):
                s = ql * WINP
                g_scr[s : s + WINP, s : s + WINP] = gtile[:, s : s + WINP]

            # ---- dVol ------------------------------------------------
            ds2 = dot(g_scr[:], exN).astype(dt)
            for ql in range(ch):
                dr_scr[
                    ql * WINP : (ql + 1) * WINP,
                    ql * wlp : (ql + 1) * wlp,
                ] = ds2[ql * WINP : (ql + 1) * WINP, :]
            dvol_ref[0, rl, :, c * cb : (c + 1) * cb] = dot(
                ey2T, dr_scr[:]
            ).astype(dt)

            # ---- dcoords ---------------------------------------------
            rp = dot(ey2, vband).astype(dt)
            rpy = dot(dey2, vband).astype(dt)
            for ql in range(ch):
                s2_scr[0, ql * WINP : (ql + 1) * WINP, :] = rp[
                    ql * WINP : (ql + 1) * WINP,
                    ql * wlp : (ql + 1) * wlp,
                ]
                s2_scr[1, ql * WINP : (ql + 1) * WINP, :] = rpy[
                    ql * WINP : (ql + 1) * WINP,
                    ql * wlp : (ql + 1) * wlp,
                ]
            p_x = dot(s2_scr[0], dexT[:, c * cw : (c + 1) * cw])
            p_y = dot(s2_scr[1], exT[:, c * cw : (c + 1) * cw])
            gf = g_scr[:].astype(jnp.float32)
            rx = jnp.sum(gf * p_x, axis=1, keepdims=True)  # (cw, 1)
            ry = jnp.sum(gf * p_y, axis=1, keepdims=True)
            # HIGHEST regardless of dtype: a bf16 pass would round the
            # f32 row-sums to 2^-9
            dx = dot(gs, rx, jax.lax.Precision.HIGHEST)
            dy = dot(gs, ry, jax.lax.Precision.HIGHEST)
            dxy_ref[0, rl, c * ch : (c + 1) * ch, 0:1] = dx
            dxy_ref[0, rl, c * ch : (c + 1) * ch, 1:2] = dy


def _bwd_impl(vol, coords, g, radius, interpret):
    Tl, N, h1, hp, lanes = vol.shape
    w1 = coords.shape[3]
    win = 2 * radius + 1
    ch, w1p, wlp = _resolve_chunking(w1, lanes)

    volr = vol.reshape(Tl * N, h1, hp, lanes)
    gr = _pack_windows(
        g.reshape(Tl * N, h1, w1, win, win), w1p, win, ch
    )
    xp, yc = _prep_positions(
        coords.reshape(Tl * N, h1, w1, 2), radius, w1p, ch
    )
    nch = w1p // ch
    cw = ch * WINP
    xc = (
        xp.reshape(Tl * N, h1, nch, cw).transpose(0, 1, 3, 2)
    )
    yr = (
        yc.transpose(0, 1, 3, 2).reshape(Tl * N, h1, 1, w1p * WINP)
    )
    ri = _pick_ri(h1, 2 * hp * lanes * vol.dtype.itemsize)

    dvolr, dxy = pl.pallas_call(
        functools.partial(
            _bwd_kernel, w1p=w1p, win=win, hp=hp, wlp=wlp, ri=ri, ch=ch
        ),
        grid=(Tl * N, h1 // ri),
        in_specs=[
            _row_spec(ri, w1p * WINP),
            _chunkcol_spec(ri, nch, ch),
            _chunkcol_spec(ri, nch, ch),
            _row_spec(ri, w1p * WINP),
            _slab_spec(ri, hp, lanes),
            pl.BlockSpec(
                (1, ri, w1p // ch, WINP, cw),
                lambda t, i: (t, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            _slab_spec(ri, hp, lanes),
            pl.BlockSpec(
                (1, ri, w1p, 2),
                lambda t, i: (t, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tl * N, h1, hp, lanes), vol.dtype),
            jax.ShapeDtypeStruct((Tl * N, h1, w1p, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cw, wlp), vol.dtype),  # band gathers
            pltpu.VMEM((cw, cw), vol.dtype),  # Gbd
            pltpu.VMEM((cw, ch * wlp), vol.dtype),  # dR' placement
        ],
        interpret=interpret,
    )(xp, xc, yc, yr, volr, gr)

    dvol = dvolr.reshape(Tl, N, h1, hp, lanes)
    dcoords = dxy[:, :, :w1].reshape(Tl, N, h1, w1, 2).astype(coords.dtype)
    return dvol, dcoords


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lookup_cvjp(vol, coords, radius, interpret):
    return _fwd_impl(vol, coords, radius, interpret)


def _vjp_fwd(vol, coords, radius, interpret):
    return _fwd_impl(vol, coords, radius, interpret), (vol, coords)


def _vjp_bwd(radius, interpret, residuals, g):
    vol, coords = residuals
    return _bwd_impl(vol, coords, g, radius, interpret)


_lookup_cvjp.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def to_slab(vol: jax.Array, w1p=None, wlp=None) -> jax.Array:
    """(Tl, N, h1, w1, hp, wl) query-map volume -> row-slab layout
    (Tl, N, h1, hp, w1p*wlp): per-query bands zero-padded to wlp =
    roundup(wl, 16) columns, query count padded to w1p = roundup(w1, 8)
    zero bands. One HBM transpose per forward; the lookup then runs
    every refinement iteration on the compact slab. `wlp` can be forced
    higher (e.g. 128 to lane-align every query band) at the cost of
    proportionally more HBM per level — a measured trade, see
    scripts/exp_align_ab.py."""
    Tl, N, h1, w1, hp, wl = vol.shape
    if w1p is None:
        w1p = _round_up(w1, 8)
    if wlp is None:
        wlp = _round_up(wl, COLPAD)
    assert wlp >= wl and wlp % COLPAD == 0, (wl, wlp)
    if wlp != wl or w1p != w1:
        vol = jnp.pad(
            vol,
            ((0, 0),) * 3 + ((0, w1p - w1), (0, 0), (0, wlp - wl)),
        )
    return vol.transpose(0, 1, 2, 4, 3, 5).reshape(
        Tl, N, h1, hp, w1p * wlp
    )


def lookup_level_slab(
    vol_slab: jax.Array,
    coords: jax.Array,
    radius: int,
    interpret: bool = False,
) -> jax.Array:
    """Windowed bilinear lookup on a row-slab volume (differentiable).

    Args:
      vol_slab: (Tl, N, h1, hp, w1p*wlp) slab volume from to_slab();
        zero pad rows/columns reproduce grid_sample zero padding
        because they correlate zero features.
      coords: (Tl, N, h1, w1, 2) query positions in this level's map
        pixels, (x, y) last.
      radius: window radius r (2r+2 <= 16).

    Returns:
      (Tl, N, h1, w1, (2r+1)^2) window features, dy-major, vol dtype.
    """
    return _lookup_cvjp(vol_slab, coords, radius, interpret)


def _quantize(v: jax.Array, reduce_axes):
    """Symmetric int8 with one scale per query-grid row (the kernel's
    unit of work: row i's program only ever reads slab row i, so
    per-row scales cost nothing extra). Inference-only: the q8 lookup
    has no VJP (training keeps the bf16/f32 slab). Worst-case
    quantization error is scale/2 ~= 0.4% of the row's max |corr|, on
    par with the bf16 volume's own rounding."""
    # The scale math runs in f32 (tiny, (Tl, N, h1)), but the
    # full-volume elementwise pass stays in the volume's own dtype:
    # upcasting the B=16 level-0 volume to f32 is 11.7 GB and OOMed the
    # chip (round-4 bench_q8 HLO dump). A bf16 multiply adds ~0.4%
    # rounding, the same order as the int8 quantization step itself.
    amax = jnp.max(jnp.abs(v), axis=reduce_axes).astype(jnp.float32)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    inv = (1.0 / scale).astype(v.dtype)
    inv = inv.reshape(inv.shape + (1,) * len(reduce_axes))
    q = jnp.clip(jnp.round(v * inv), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def quantize_slab(vol_slab: jax.Array):
    """(Tl, N, h1, hp, lanes) slab -> (int8 slab, (Tl, N, h1) scale)."""
    return _quantize(vol_slab, (3, 4))


def quantize_volume(vol: jax.Array):
    """(Tl, N, h1, w1, hp, wl) per-query volume -> (int8 volume,
    (Tl, N, h1) scale). Same scale granularity as quantize_slab, but
    applied BEFORE to_slab so the slab transpose moves int8 bytes
    instead of bf16 — ~2 GB less one-time HBM traffic at the flagship
    B=4 shapes."""
    return _quantize(vol, (3, 4, 5))


def lookup_level_slab_q8(
    vol_slab_q8: jax.Array,
    scale: jax.Array,
    coords: jax.Array,
    radius: int,
    interpret: bool = False,
) -> jax.Array:
    """Forward-only windowed bilinear lookup on an int8 row-slab volume
    (from quantize_slab). Halves the dominant per-iteration HBM stream
    (the level-0 slab read) relative to the bf16 slab; output is bf16.
    Not differentiable — use lookup_level_slab for training."""
    assert vol_slab_q8.dtype == jnp.int8, vol_slab_q8.dtype
    return _fwd_impl(vol_slab_q8, coords, radius, interpret, scale=scale)
