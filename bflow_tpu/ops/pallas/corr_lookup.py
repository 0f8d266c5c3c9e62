"""Pallas TPU kernels: windowed bilinear correlation lookup (fwd + vjp).

Every query pixel owns its own (hl, wl) correlation map inside the
all-pairs volume; the lookup reads one (2r+1)x(2r+1) bilinear window
around its (x, y) coordinate, with grid_sample zero padding outside the
map (reference op: /root/reference/models/raft_utils/corr.py:307-351).

Kernel strategy (chunked block-diagonal contractions):

  * The volume arrives row-padded to HP = roundup(hl, 16) with zeros
    (build_corr_pyramid pads the target features), so every per-query
    map is sublane-tile aligned and out-of-range window rows read
    exact zeros — grid_sample zero padding for free, no clamping.
  * Bilinear tap weights are "hat functions": the weight of column c
    for tap b of query q is relu(1 - |x_q - r + b - c|), identical to
    the (1-fx)/fx one-hot blend. Both selector families are built for
    ALL queries of a program in two dense 2D VPU ops — transposed
    (wl, w1*WINP) / (HP, w1*WINP) so the host-precomputed tap
    positions stream in lane-major and no in-kernel transposes occur.
  * Queries are processed in chunks of CH=8. Taps are padded to
    WINP=16 per query, so a chunk's selector slice is exactly
    8*16 = 128 lanes — one lane tile. Per chunk the window extraction
    is TWO MXU contractions over the whole chunk:
      T1[(q,b), (q'',y)] = sum_x exT[x,(q,b)] * V[(q'',y), x]
      OUT[(q,a), (q',b)] = sum_y eyT[y,(q,a)] * T1diag[(q',b), y]
    where T1diag copies the 8 diagonal (WINP, HP) blocks (the only
    rows/cols where q''==q). The wanted windows are the diagonal
    (win, win) blocks of OUT. Phantom taps (b >= 2r+1) produce values
    in rows/cols that are never read.
  * vs the v1 per-query form (one 9x32 and one 9x80 matmul per query,
    fully unrolled, 16-aligned dynamic loads, SMEM scalar DMA): ~20x
    fewer MXU invocations at far better shapes.

Backward (custom VJP): the output is bilinear in the coordinates and
linear in the volume, so both cotangents are the same contractions
transposed. The per-query (win, win) output cotangents are assembled
into a block-diagonal Gbd (128x128 per chunk, zero off-diagonal and on
phantom taps), which makes every cross-contraction exact per query:

  dV chunk   = EYbd @ (Gbd @ exT^T)            (collision-free: each
               query owns its rows — written as one contiguous chunk)
  dcoord_x,q = sum_ab g * (ey^T V dex),  via Gbd o (eyT^T @ Udiag)
  dcoord_y,q = sum_ab g * (dey^T V ex),  via Gbd o (deyT^T @ T1diag)

with dex/dey the one-hot derivative selectors. Gradients reduce to a
per-query scalar through one rowsum and a tiny group-sum matmul, and
leave through a normal VMEM output block — no SMEM accumulation, no
manual DMA anywhere in either pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWPAD = 16  # volumes are row-padded to multiples of this
WINP = 16  # per-query tap stride (padded window diameter)
CH = 8  # queries per chunk: CH * WINP = 128 = one lane tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _precision(dt):
    # f32 volumes need HIGHEST (single-pass MXU bf16 would round the
    # correlation values); bf16 volumes take the fast default pass.
    return (
        jax.lax.Precision.HIGHEST
        if dt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _hat(pos, n, axis):
    """Bilinear tap weights: weight of grid line g for tap position p is
    relu(1 - |p - g|) — exactly the floor/frac blend, with out-of-range
    taps all-zero (grid_sample zero padding).

    pos is (1, W) [axis=0 -> output (n, W)] or (W, 1) [axis=1 ->
    output (W, n)]: both orientations are built directly so every MXU
    contraction downstream is a canonical (m,k)@(k,n) — Mosaic inserts
    expensive vector relayouts for transposed operands otherwise."""
    shape = (n, pos.shape[-1]) if axis == 0 else (pos.shape[0], n)
    g = jax.lax.broadcasted_iota(jnp.int32, shape, axis).astype(
        jnp.float32
    )
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - g))


def _dhat(pos, n, axis):
    """d(hat)/d(position): [g == floor(p)+1] - [g == floor(p)] — the
    derivative of the fractional blend w.r.t. the query coordinate."""
    shape = (n, pos.shape[-1]) if axis == 0 else (pos.shape[0], n)
    g = jax.lax.broadcasted_iota(jnp.int32, shape, axis).astype(
        jnp.float32
    )
    f = jnp.floor(pos)
    return (g == f + 1.0).astype(jnp.float32) - (g == f).astype(
        jnp.float32
    )


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(
    xp_ref, yp_ref, vol_ref, out_ref, scr, *, w1, win, ch, hp, wl, nw
):
    """Two empirically-selected stage-2 forms (B=4 flagship timings):

    hp > 32 ('eybd'): OUT = EYbd @ T1 with a block-diagonal EY whose
      assembly depends only on the selectors — T1 of the next chunk is
      issued before OUT consumes the current one, keeping an
      independent matmul in flight (3.25 vs 5.89 ms at level 0).
    hp <= 32 ('strips'): copy T1's diagonal (hp, LW) strips and
      contract OUT = ey @ strips with K=hp — the block-diagonal form
      wastes ch x in K, which dominates when hp is small (1.11 vs
      1.92 ms at level 1). Same lookahead-1 pipeline.

    nw > 1 packs several pyramid levels (same targets, zero-guarded
    column bands, shared row padding) into ONE volume: each query then
    owns nw window groups of WINP taps, and the per-query cross
    product, strip copy and selector builds are shared across levels.
    """
    dt = vol_ref.dtype
    prec = _precision(dt)
    lw = nw * WINP  # taps per query
    cw = ch * lw
    exT = _hat(xp_ref[0, 0], wl, 0).astype(dt)  # (wl, w1*lw)
    ey = _hat(yp_ref[0, 0], hp, 1).astype(dt)  # (w1*lw, hp)

    n = w1 // ch
    use_eybd = hp > 32 and nw == 1
    if use_eybd:
        scr[...] = jnp.zeros_like(scr)

    def t1_of(c):
        # T1[(q'',y), (q,b)] = sum_x vc[(q'',y), x] * exT[x, lo+(q,b)]
        q0 = c * ch
        vc = vol_ref[0, 0, q0 : q0 + ch].reshape(ch * hp, wl)
        return jax.lax.dot_general(
            vc, exT[:, q0 * lw : q0 * lw + cw],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)

    # Software pipeline: the next chunk's T1 is issued BEFORE this
    # chunk's OUT consumes the current one, so the MXU always has an
    # independent matmul in flight while the VPU assembles. Lookahead 1
    # measured fastest — deeper lookahead spills cross-products.
    t1_next = t1_of(0)
    for c in range(n):
        t1 = t1_next
        if c + 1 < n:
            t1_next = t1_of(c + 1)
        lo = c * cw
        if use_eybd:
            # EYbd[(q,a),(q'',y)] block-diagonal: depends only on ey,
            # never on T1 — off the matmul critical path
            for ql in range(ch):
                scr[
                    ql * lw : (ql + 1) * lw, ql * hp : (ql + 1) * hp
                ] = ey[lo + ql * lw : lo + (ql + 1) * lw, :]
            out = jax.lax.dot_general(
                scr[:], t1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        else:
            for ql in range(ch):
                s = ql * lw
                scr[:, s : s + lw] = t1[
                    ql * hp : (ql + 1) * hp, s : s + lw
                ]
            out = jax.lax.dot_general(
                ey[lo : lo + cw], scr[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        for ql in range(ch):
            for wg in range(nw):
                s = ql * lw + wg * WINP
                out_ref[0, 0, c * ch + ql, wg] = out[
                    s : s + win, s : s + win
                ].astype(out_ref.dtype)


SENTINEL = -65536.0  # tap position guaranteed outside every column band


def _tap_positions(coords, radius, w1, xoffs, wls):
    """(TN, h1, w1, nw, 2) coords -> tap positions, one per
    (query, window group, tap): pos[(q*nw + g)*WINP + b] =
    xoffs[g] + coord - r + b. x positions come out lane-major
    (TN, h1, 1, W) and y positions sublane-major (TN, h1, W, 1): each
    selector family is built directly in the orientation its canonical
    MXU contraction consumes.

    x taps whose LEVEL-LOCAL position falls outside (-1, wl_g) carry no
    weight in that level's map and are moved to SENTINEL so they cannot
    leak into a neighbouring packed column band (each band also keeps a
    zero guard column for the in-range boundary blend)."""
    tn, h1, _, nw, _ = coords.shape
    offs = jnp.arange(WINP, dtype=jnp.float32) - float(radius)
    pos = coords[..., None] + offs  # (TN, h1, w1, nw, 2, WINP)
    px = pos[..., 0, :]  # (TN, h1, w1, nw, WINP) level-local x taps
    py = pos[..., 1, :]
    wl_g = jnp.asarray(wls, jnp.float32).reshape(nw, 1)
    off_g = jnp.asarray(xoffs, jnp.float32).reshape(nw, 1)
    px = jnp.where(
        (px > -1.0) & (px < wl_g), px + off_g, SENTINEL
    )
    xp = px.reshape(tn, h1, 1, w1 * nw * WINP)
    yp = py.reshape(tn, h1, w1 * nw * WINP, 1)
    return xp, yp


def _row_spec(w):
    return pl.BlockSpec(
        (1, 1, 1, w),
        lambda t, i: (t, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _col_spec(w):
    return pl.BlockSpec(
        (1, 1, w, 1),
        lambda t, i: (t, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _vol_spec(w1, hp, wl):
    return pl.BlockSpec(
        (1, 1, w1, hp, wl),
        lambda t, i: (t, i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _fwd_impl(vol, coords, radius, xoffs, wls, interpret):
    Tl, N, h1, w1, hp, wl = vol.shape
    nw = len(xoffs)
    assert hp % ROWPAD == 0, (
        f"forward volume rows must be zero-padded to {ROWPAD}: {vol.shape}"
    )
    win = 2 * radius + 1
    assert win <= WINP, (radius, WINP)
    ch = next(c for c in (CH, 4, 2, 1) if w1 % c == 0)
    lw = nw * WINP

    volr = vol.reshape(Tl * N, h1, w1, hp, wl)
    xp, yp = _tap_positions(
        coords.reshape(Tl * N, h1, w1, nw, 2), radius, w1, xoffs, wls
    )

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, w1=w1, win=win, ch=ch, hp=hp, wl=wl, nw=nw
        ),
        grid=(Tl * N, h1),
        in_specs=[
            _row_spec(w1 * lw),
            _col_spec(w1 * lw),
            _vol_spec(w1, hp, wl),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, w1, nw, win, win),
            lambda t, i: (t, i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (Tl * N, h1, w1, nw, win, win), vol.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (ch * lw, ch * hp)
                if (hp > 32 and nw == 1)
                else (hp, ch * lw),
                vol.dtype,
            ),
        ],
        interpret=interpret,
    )(xp, yp, volr)

    return out.reshape(Tl, N, h1, w1, nw, win * win)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(
    xr_ref, xc_ref, yr_ref, yc_ref, vol_ref, g_ref, dvol_ref, dxy_ref,
    gbd, eybd, t1d, ud, *, w1, win, ch, hp, wl, nw
):
    dt = vol_ref.dtype
    prec = _precision(dt)
    lw = nw * WINP
    cw = ch * lw

    xrow = xr_ref[0, 0]  # (1, W)
    xcol = xc_ref[0, 0]  # (W, 1)
    yrow = yr_ref[0, 0]
    ycol = yc_ref[0, 0]
    exT = _hat(xrow, wl, 0).astype(dt)  # (wl, W)
    dexT = _dhat(xrow, wl, 0).astype(dt)
    ex_n = _hat(xcol, wl, 1).astype(dt)  # (W, wl)
    eyT = _hat(yrow, hp, 0).astype(dt)  # (hp, W)
    ey = _hat(ycol, hp, 1).astype(dt)  # (W, hp)
    dey = _dhat(ycol, hp, 1).astype(dt)

    # group-sum matrix: row (q, window-group) sums its WINP-tap strip
    gs = (
        jax.lax.broadcasted_iota(jnp.int32, (ch * nw, cw), 1) // WINP
        == jax.lax.broadcasted_iota(jnp.int32, (ch * nw, cw), 0)
    ).astype(jnp.float32)

    # every chunk overwrites the same diagonal block positions, so the
    # zero background is established once
    gbd[...] = jnp.zeros_like(gbd)
    eybd[...] = jnp.zeros_like(eybd)
    n = w1 // ch

    def tu_of(c):
        # T1[(q'',y), (q,b)] = sum_x vc * exT; U likewise with d(ex)
        q0 = c * ch
        lo = q0 * lw
        vc = vol_ref[0, 0, q0 : q0 + ch].reshape(ch * hp, wl)
        t1x = jax.lax.dot_general(
            vc, exT[:, lo : lo + cw], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        ux = jax.lax.dot_general(
            vc, dexT[:, lo : lo + cw], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        return t1x, ux

    # software pipeline as in the forward: next chunk's volume
    # contractions are in flight while this chunk's VPU assembly runs
    tu_next = tu_of(0)
    for c in range(n):
        t1x, ux = tu_next
        if c + 1 < n:
            tu_next = tu_of(c + 1)
        q0 = c * ch
        lo = q0 * lw

        # block-diagonal output cotangent: zero off-diagonal, on the
        # phantom taps (a, b >= win) AND across window groups, which
        # masks every junk strip below
        for ql in range(ch):
            for wg in range(nw):
                s = ql * lw + wg * WINP
                gbd[s : s + win, s : s + win] = (
                    g_ref[0, 0, q0 + ql, wg].astype(dt)
                )

        # ---- coordinate gradients ------------------------------------
        for ql in range(ch):
            s = ql * lw
            t1d[:, s : s + lw] = t1x[
                ql * hp : (ql + 1) * hp, s : s + lw
            ]
            ud[:, s : s + lw] = ux[
                ql * hp : (ql + 1) * hp, s : s + lw
            ]
        # P[(q,a),(q',b)] = sum_y ey[(q,a), y] * Ud[y, (q',b)]
        p_x = jax.lax.dot_general(
            ey[lo : lo + cw], ud[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        p_y = jax.lax.dot_general(
            dey[lo : lo + cw], t1d[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        gf = gbd[:].astype(jnp.float32)
        rx = jnp.sum(gf * p_x, axis=1, keepdims=True)  # (cw, 1)
        ry = jnp.sum(gf * p_y, axis=1, keepdims=True)
        # HIGHEST regardless of volume dtype: a default (single bf16
        # pass) dot here would round the f32 row-sums to 2^-9
        dx = jax.lax.dot_general(  # (ch*nw, 1) per-window scalars
            gs, rx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dy = jax.lax.dot_general(
            gs, ry, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dxy_ref[0, 0, q0 * nw : (q0 + ch) * nw, 0:1] = dx
        dxy_ref[0, 0, q0 * nw : (q0 + ch) * nw, 1:2] = dy

        # ---- dVol = ey^T g ex per query, as one chunk matmul pair ----
        m = jax.lax.dot_general(  # (cw, wl): M[(q,a),x] = sum_b g * ex
            gbd[:], ex_n[lo : lo + cw], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        for ql in range(ch):
            eybd[ql * hp : (ql + 1) * hp, ql * lw : (ql + 1) * lw] = (
                eyT[:, lo + ql * lw : lo + (ql + 1) * lw]
            )
        dvc = jax.lax.dot_general(  # (ch*hp, wl)
            eybd[:], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dvol_ref[0, 0, q0 : q0 + ch] = dvc.reshape(ch, hp, wl).astype(dt)


def _bwd_vmem_estimate(w1: int, hp: int, wl: int, sz: int, nw: int = 1) -> int:
    """Per-program VMEM bytes of the backward kernel: double-buffered
    volume, dVol and tile-padded cotangent blocks, the column-layout
    position inputs ((W, 1) tiles at 1/128 lane occupancy), six selector
    families with f32 build temporaries, and the chunk values."""
    lw = nw * WINP
    vol = 2 * w1 * hp * wl * sz
    dvol = 2 * w1 * hp * wl * sz
    gblk = 2 * w1 * nw * 16 * 128 * sz
    poscol = 2 * 2 * w1 * lw * 512
    sel = 6 * w1 * lw * (wl + hp) // 2 * (sz + 4)
    vals = 8 * CH * lw * CH * hp * 4
    return vol + dvol + gblk + poscol + sel + vals


def _bwd_impl(vol, coords, g, radius, xoffs, wls, interpret):
    Tl, N, h1, w1, hp, wl = vol.shape
    nw = len(xoffs)
    win = 2 * radius + 1
    lw = nw * WINP

    # Halve the queries per program until the working set fits the
    # ~16 MB scoped VMEM — a pure reshape (row groups are independent).
    if (
        _bwd_vmem_estimate(w1, hp, wl, vol.dtype.itemsize, nw)
        > 11_000_000
        and w1 % 2 == 0
    ):
        dvol, dcoords = _bwd_impl(
            vol.reshape(Tl, N, h1 * 2, w1 // 2, hp, wl),
            coords.reshape(Tl, N, h1 * 2, w1 // 2, nw, 2),
            g.reshape(Tl, N, h1 * 2, w1 // 2, nw, win * win),
            radius,
            xoffs,
            wls,
            interpret,
        )
        return (
            dvol.reshape(Tl, N, h1, w1, hp, wl),
            dcoords.reshape(Tl, N, h1, w1, nw, 2),
        )

    ch = next(c for c in (CH, 4, 2, 1) if w1 % c == 0)
    cw = ch * lw

    volr = vol.reshape(Tl * N, h1, w1, hp, wl)
    g6 = g.reshape(Tl * N, h1, w1, nw, win, win)
    xp, yp = _tap_positions(
        coords.reshape(Tl * N, h1, w1, nw, 2), radius, w1, xoffs, wls
    )
    tn = Tl * N
    xc = xp.reshape(tn, h1, w1 * lw, 1)
    yr = yp.reshape(tn, h1, 1, w1 * lw)

    dvolr, dxy = pl.pallas_call(
        functools.partial(
            _bwd_kernel, w1=w1, win=win, ch=ch, hp=hp, wl=wl, nw=nw
        ),
        grid=(Tl * N, h1),
        in_specs=[
            _row_spec(w1 * lw),
            _col_spec(w1 * lw),
            _row_spec(w1 * lw),
            _col_spec(w1 * lw),
            _vol_spec(w1, hp, wl),
            pl.BlockSpec(
                (1, 1, w1, nw, win, win),
                lambda t, i: (t, i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            _vol_spec(w1, hp, wl),
            pl.BlockSpec(
                (1, 1, w1 * nw, 2),
                lambda t, i: (t, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tl * N, h1, w1, hp, wl), vol.dtype),
            jax.ShapeDtypeStruct((Tl * N, h1, w1 * nw, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((cw, cw), vol.dtype),  # gbd
            pltpu.VMEM((ch * hp, cw), vol.dtype),  # eybd
            pltpu.VMEM((hp, cw), vol.dtype),  # t1d
            pltpu.VMEM((hp, cw), vol.dtype),  # ud
        ],
        interpret=interpret,
    )(xp, xc, yr, yp, volr, g6)

    dvol = dvolr.reshape(Tl, N, h1, w1, hp, wl)
    dcoords = dxy.reshape(Tl, N, h1, w1, nw, 2).astype(coords.dtype)
    return dvol, dcoords


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _lookup_cvjp(vol, coords, radius, xoffs, wls, interpret):
    return _fwd_impl(vol, coords, radius, xoffs, wls, interpret)


def _vjp_fwd(vol, coords, radius, xoffs, wls, interpret):
    return (
        _fwd_impl(vol, coords, radius, xoffs, wls, interpret),
        (vol, coords),
    )


def _vjp_bwd(radius, xoffs, wls, interpret, residuals, g):
    vol, coords = residuals
    return _bwd_impl(vol, coords, g, radius, xoffs, wls, interpret)


_lookup_cvjp.defvjp(_vjp_fwd, _vjp_bwd)


def _vmem_estimate(w1: int, hp: int, wl: int, sz: int, nw: int = 1) -> int:
    """Per-program VMEM bytes for the larger (backward) pass:
    double-buffered volume, dVol and (16, 128)-tile-padded cotangent
    blocks, four selector families plus f32 build temporaries, and the
    chunk cross-product values/scratch."""
    lw = nw * WINP
    vol = 2 * w1 * hp * wl * sz
    dvol = 2 * w1 * hp * wl * sz
    gblk = 2 * 2 * w1 * nw * 16 * 128 * sz
    sel = 4 * w1 * lw * (wl + hp) * (sz + 4) // 2
    vals = 6 * CH * lw * max(CH * hp, CH * lw) * 4
    return vol + dvol + gblk + sel + vals


def _pick_row_group(h1, w1, hp, wl, itemsize, nw=1):
    """Rows of queries per program: amortizes per-program fixed costs on
    the small pyramid levels while keeping the working set well under
    the ~16 MB scoped VMEM and the chunk loop short."""
    for ri in (6, 5, 4, 3, 2):
        if h1 % ri:
            continue
        if ri * w1 > 384:
            continue
        if _vmem_estimate(ri * w1, hp, wl, itemsize, nw) > 10_000_000:
            continue
        return ri
    return 1


def lookup_levels_packed(
    vols, coords_list, radius: int, interpret: bool = False
):
    """Windowed lookups for SEVERAL pyramid levels in one kernel pass.

    The levels must share (Tl, N, h1, w1) — i.e. the same target set
    and query grid; maps may differ in size. Their maps are packed into
    one per-query super-map: rows zero-padded to a common multiple of
    16, columns concatenated with one zero guard column per band (the
    in-range boundary blend reads it; fully out-of-band taps are moved
    to a sentinel position by _tap_positions). Zero rows/columns ARE
    grid_sample's zero padding, so semantics are exact per level, while
    the per-query selector builds, cross-products and strip copies are
    shared — the per-query fixed costs that dominate the small levels.

    Args:
      vols: list of (Tl, N, h1, w1, hl_i, wl_i) correlation volumes.
      coords_list: matching list of (Tl, N, h1, w1, 2) query positions,
        each in ITS level's map pixels.
      radius: window radius r (2r+1 <= 16).

    Returns:
      list of (Tl, N, h1, w1, (2r+1)^2) window features, dy-major.
    """
    nw = len(vols)
    assert nw == len(coords_list) and nw >= 1
    Tl, N, h1, w1 = vols[0].shape[:4]
    hp = max(_round_up(v.shape[4], ROWPAD) for v in vols)

    parts, xoffs, wls = [], [], []
    off = 0
    for i, v in enumerate(vols):
        assert v.shape[:4] == (Tl, N, h1, w1), (v.shape, vols[0].shape)
        hl, wl = v.shape[4:]
        guard = 1 if (nw > 1 and i < nw - 1) else 0
        parts.append(
            jnp.pad(
                v, ((0, 0),) * 4 + ((0, hp - hl), (0, guard))
            )
        )
        xoffs.append(off)
        wls.append(wl)
        off += wl + guard
    volp = parts[0] if nw == 1 else jnp.concatenate(parts, axis=-1)
    coordsp = jnp.stack(coords_list, axis=-2)  # (Tl, N, h1, w1, nw, 2)

    ri = _pick_row_group(h1, w1, hp, off, volp.dtype.itemsize, nw)
    if ri > 1:
        volp = volp.reshape(Tl, N, h1 // ri, ri * w1, hp, off)
        coordsp = coordsp.reshape(Tl, N, h1 // ri, ri * w1, nw, 2)
    out = _lookup_cvjp(
        volp, coordsp, radius, tuple(xoffs), tuple(wls), interpret
    )
    out = out.reshape(Tl, N, h1, w1, nw, -1)
    return [out[..., i, :] for i in range(nw)]


def lookup_level_pallas(
    vol: jax.Array, coords: jax.Array, radius: int, interpret: bool = False
) -> jax.Array:
    """One pyramid level's windowed lookup (differentiable custom VJP).

    Args:
      vol: (Tl, N, h1, w1, hl, wl) correlation maps (f32 or bf16). Rows
        should be zero-padded to a multiple of 16 (build_corr_pyramid
        does this); unpadded volumes are padded here at the cost of a
        volume-sized copy.
      coords: (Tl, N, h1, w1, 2) query positions in this level's pixels,
        (x, y) last.
      radius: window radius r (2r+1 <= 16).

    Returns:
      (Tl, N, h1, w1, (2r+1)^2) window features, dy-major, vol dtype.
    """
    return lookup_levels_packed([vol], [coords], radius, interpret)[0]
