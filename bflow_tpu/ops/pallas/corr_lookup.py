"""Pallas TPU kernels: windowed bilinear correlation lookup (fwd + vjp).

Legacy (round-2) formulation, kept as `lookup_method='pallas_v2'`. The
production default is the round-3 banded-slab kernel
(corr_lookup_v3.lookup_level_slab), which is layout-compact and
faster; this kernel works on the plain (..., hl-pad, wl) volume layout
and stays as the measured fallback / A-B reference. The multi-level
"packed" variant that used to live here lost every hardware A/B
(12.5 vs 11.3 ms/iter at B=4) and was removed in round 3 per review.

Round-4 demotion decision (VERDICT r3 #6: "delete or demote with a
rationale"): KEPT, because the round-5 lookup-kernel redesign (the
slab kernel is issue-bound ~20x off its bandwidth roofline; the q8 A/B
proved byte-side fixes can't pay) starts from comparing these two
formulations' per-chunk issue structure, and this kernel is the only
on-chip-verified second implementation (1.3e-7 vs the gather oracle).
Delete it when the redesigned kernel lands.

Every query pixel owns its own (hl, wl) correlation map inside the
all-pairs volume; the lookup reads one (2r+1)x(2r+1) bilinear window
around its (x, y) coordinate, with grid_sample zero padding outside the
map (reference op: /root/reference/models/raft_utils/corr.py:307-351).

Kernel strategy (chunked block-diagonal contractions):

  * The volume arrives row-padded to HP = roundup(hl, 16) with zeros
    (build_corr_pyramid pads the target features), so every per-query
    map is sublane-tile aligned and out-of-range window rows read
    exact zeros — grid_sample zero padding for free, no clamping.
    Out-of-range x taps likewise carry zero hat weight against the
    wl in-range grid columns, so no x masking is needed either.
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
    """d(hat)/d(pos): [grid == floor(pos)+1] - [grid == floor(pos)]."""
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
    xp_ref, yp_ref, vol_ref, out_ref, scr, *, w1, win, ch, hp, wl
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
    """
    dt = vol_ref.dtype
    prec = _precision(dt)
    cw = ch * WINP
    exT = _hat(xp_ref[0, 0], wl, 0).astype(dt)  # (wl, w1*WINP)
    ey = _hat(yp_ref[0, 0], hp, 1).astype(dt)  # (w1*WINP, hp)

    n = w1 // ch
    use_eybd = hp > 32
    if use_eybd:
        scr[...] = jnp.zeros_like(scr)

    def t1_of(c):
        # T1[(q'',y), (q,b)] = sum_x vc[(q'',y), x] * exT[x, lo+(q,b)]
        q0 = c * ch
        vc = vol_ref[0, 0, q0 : q0 + ch].reshape(ch * hp, wl)
        return jax.lax.dot_general(
            vc, exT[:, q0 * WINP : q0 * WINP + cw],
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
                    ql * WINP : (ql + 1) * WINP, ql * hp : (ql + 1) * hp
                ] = ey[lo + ql * WINP : lo + (ql + 1) * WINP, :]
            out = jax.lax.dot_general(
                scr[:], t1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        else:
            for ql in range(ch):
                s = ql * WINP
                scr[:, s : s + WINP] = t1[
                    ql * hp : (ql + 1) * hp, s : s + WINP
                ]
            out = jax.lax.dot_general(
                ey[lo : lo + cw], scr[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        for ql in range(ch):
            s = ql * WINP
            out_ref[0, 0, c * ch + ql] = out[
                s : s + win, s : s + win
            ].astype(out_ref.dtype)


def _tap_positions(coords, radius, w1):
    """(TN, h1, w1, 2) coords -> tap positions, one per (query, tap):
    pos[q*WINP + b] = coord - r + b. x positions come out lane-major
    (TN, h1, 1, W) and y positions sublane-major (TN, h1, W, 1): each
    selector family is built directly in the orientation its canonical
    MXU contraction consumes. Out-of-range and phantom (b >= 2r+1)
    taps need no masking: their hat weights against the in-range grid
    are zero or land in never-read output rows/cols."""
    tn, h1, _, _ = coords.shape
    offs = jnp.arange(WINP, dtype=jnp.float32) - float(radius)
    pos = coords[..., None] + offs  # (TN, h1, w1, 2, WINP)
    xp = pos[..., 0, :].reshape(tn, h1, 1, w1 * WINP)
    yp = pos[..., 1, :].reshape(tn, h1, w1 * WINP, 1)
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


def _fwd_impl(vol, coords, radius, interpret):
    Tl, N, h1, w1, hp, wl = vol.shape
    assert hp % ROWPAD == 0, (
        f"forward volume rows must be zero-padded to {ROWPAD}: {vol.shape}"
    )
    win = 2 * radius + 1
    assert win <= WINP, (radius, WINP)
    ch = next(c for c in (CH, 4, 2, 1) if w1 % c == 0)

    volr = vol.reshape(Tl * N, h1, w1, hp, wl)
    xp, yp = _tap_positions(
        coords.reshape(Tl * N, h1, w1, 2), radius, w1
    )

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, w1=w1, win=win, ch=ch, hp=hp, wl=wl
        ),
        grid=(Tl * N, h1),
        in_specs=[
            _row_spec(w1 * WINP),
            _col_spec(w1 * WINP),
            _vol_spec(w1, hp, wl),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, w1, win, win),
            lambda t, i: (t, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (Tl * N, h1, w1, win, win), vol.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (ch * WINP, ch * hp) if hp > 32 else (hp, ch * WINP),
                vol.dtype,
            ),
        ],
        interpret=interpret,
    )(xp, yp, volr)

    return out.reshape(Tl, N, h1, w1, win * win)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(
    xr_ref, xc_ref, yr_ref, yc_ref, vol_ref, g_ref, dvol_ref, dxy_ref,
    gbd, eybd, t1d, ud, *, w1, win, ch, hp, wl
):
    dt = vol_ref.dtype
    prec = _precision(dt)
    cw = ch * WINP

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

    # group-sum matrix: row q sums its WINP-tap strip
    gs = (
        jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1) // WINP
        == jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0)
    ).astype(jnp.float32)

    # every chunk overwrites the same diagonal block positions, so the
    # zero background is established once
    gbd[...] = jnp.zeros_like(gbd)
    eybd[...] = jnp.zeros_like(eybd)
    n = w1 // ch

    def tu_of(c):
        # T1[(q'',y), (q,b)] = sum_x vc * exT; U likewise with d(ex)
        q0 = c * ch
        lo = q0 * WINP
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
        lo = q0 * WINP

        # block-diagonal output cotangent: zero off-diagonal and on the
        # phantom taps (a, b >= win), which masks every junk strip below
        for ql in range(ch):
            s = ql * WINP
            gbd[s : s + win, s : s + win] = (
                g_ref[0, 0, q0 + ql].astype(dt)
            )

        # ---- coordinate gradients ------------------------------------
        for ql in range(ch):
            s = ql * WINP
            t1d[:, s : s + WINP] = t1x[
                ql * hp : (ql + 1) * hp, s : s + WINP
            ]
            ud[:, s : s + WINP] = ux[
                ql * hp : (ql + 1) * hp, s : s + WINP
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
        dx = jax.lax.dot_general(  # (ch, 1) per-query scalars
            gs, rx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dy = jax.lax.dot_general(
            gs, ry, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dxy_ref[0, 0, q0 : q0 + ch, 0:1] = dx
        dxy_ref[0, 0, q0 : q0 + ch, 1:2] = dy

        # ---- dVol = ey^T g ex per query, as one chunk matmul pair ----
        m = jax.lax.dot_general(  # (cw, wl): M[(q,a),x] = sum_b g * ex
            gbd[:], ex_n[lo : lo + cw], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        for ql in range(ch):
            eybd[ql * hp : (ql + 1) * hp, ql * WINP : (ql + 1) * WINP] = (
                eyT[:, lo + ql * WINP : lo + (ql + 1) * WINP]
            )
        dvc = jax.lax.dot_general(  # (ch*hp, wl)
            eybd[:], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dvol_ref[0, 0, q0 : q0 + ch] = dvc.reshape(ch, hp, wl).astype(dt)


def _bwd_vmem_estimate(w1: int, hp: int, wl: int, sz: int) -> int:
    """Per-program VMEM bytes of the backward kernel: double-buffered
    volume, dVol and tile-padded cotangent blocks, the column-layout
    position inputs ((W, 1) tiles at 1/128 lane occupancy), six selector
    families with f32 build temporaries, and the chunk values."""
    vol = 2 * w1 * hp * wl * sz
    dvol = 2 * w1 * hp * wl * sz
    gblk = 2 * w1 * 16 * 128 * sz
    poscol = 2 * 2 * w1 * WINP * 512
    sel = 6 * w1 * WINP * (wl + hp) // 2 * (sz + 4)
    vals = 8 * CH * WINP * CH * hp * 4
    return vol + dvol + gblk + poscol + sel + vals


def _bwd_impl(vol, coords, g, radius, interpret):
    Tl, N, h1, w1, hp, wl = vol.shape
    win = 2 * radius + 1

    # Halve the queries per program until the working set fits the
    # ~16 MB scoped VMEM — a pure reshape (row groups are independent).
    if (
        _bwd_vmem_estimate(w1, hp, wl, vol.dtype.itemsize)
        > 11_000_000
        and w1 % 2 == 0
    ):
        dvol, dcoords = _bwd_impl(
            vol.reshape(Tl, N, h1 * 2, w1 // 2, hp, wl),
            coords.reshape(Tl, N, h1 * 2, w1 // 2, 2),
            g.reshape(Tl, N, h1 * 2, w1 // 2, win * win),
            radius,
            interpret,
        )
        return (
            dvol.reshape(Tl, N, h1, w1, hp, wl),
            dcoords.reshape(Tl, N, h1, w1, 2),
        )

    ch = next(c for c in (CH, 4, 2, 1) if w1 % c == 0)

    volr = vol.reshape(Tl * N, h1, w1, hp, wl)
    g5 = g.reshape(Tl * N, h1, w1, win, win)
    xp, yp = _tap_positions(
        coords.reshape(Tl * N, h1, w1, 2), radius, w1
    )
    tn = Tl * N
    xc = xp.reshape(tn, h1, w1 * WINP, 1)
    yr = yp.reshape(tn, h1, 1, w1 * WINP)

    dvolr, dxy = pl.pallas_call(
        functools.partial(
            _bwd_kernel, w1=w1, win=win, ch=ch, hp=hp, wl=wl
        ),
        grid=(Tl * N, h1),
        in_specs=[
            _row_spec(w1 * WINP),
            _col_spec(w1 * WINP),
            _row_spec(w1 * WINP),
            _col_spec(w1 * WINP),
            _vol_spec(w1, hp, wl),
            pl.BlockSpec(
                (1, 1, w1, win, win),
                lambda t, i: (t, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            _vol_spec(w1, hp, wl),
            pl.BlockSpec(
                (1, 1, w1, 2),
                lambda t, i: (t, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tl * N, h1, w1, hp, wl), vol.dtype),
            jax.ShapeDtypeStruct((Tl * N, h1, w1, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ch * WINP, ch * WINP), vol.dtype),  # gbd
            pltpu.VMEM((ch * hp, ch * WINP), vol.dtype),  # eybd
            pltpu.VMEM((hp, ch * WINP), vol.dtype),  # t1d
            pltpu.VMEM((hp, ch * WINP), vol.dtype),  # ud
        ],
        interpret=interpret,
    )(xp, xc, yr, yp, volr, g5)

    dvol = dvolr.reshape(Tl, N, h1, w1, hp, wl)
    dcoords = dxy.reshape(Tl, N, h1, w1, 2).astype(coords.dtype)
    return dvol, dcoords


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lookup_cvjp(vol, coords, radius, interpret):
    return _fwd_impl(vol, coords, radius, interpret)


def _vjp_fwd(vol, coords, radius, interpret):
    return (
        _fwd_impl(vol, coords, radius, interpret),
        (vol, coords),
    )


def _vjp_bwd(radius, interpret, residuals, g):
    vol, coords = residuals
    return _bwd_impl(vol, coords, g, radius, interpret)


_lookup_cvjp.defvjp(_vjp_fwd, _vjp_bwd)


def _vmem_estimate(w1: int, hp: int, wl: int, sz: int) -> int:
    """Per-program VMEM bytes for the larger (backward) pass:
    double-buffered volume, dVol and (16, 128)-tile-padded cotangent
    blocks, four selector families plus f32 build temporaries, and the
    chunk cross-product values/scratch."""
    vol = 2 * w1 * hp * wl * sz
    dvol = 2 * w1 * hp * wl * sz
    gblk = 2 * 2 * w1 * 16 * 128 * sz
    sel = 4 * w1 * WINP * (wl + hp) * (sz + 4) // 2
    vals = 6 * CH * WINP * max(CH * hp, CH * WINP) * 4
    return vol + dvol + gblk + sel + vals


def _pick_row_group(h1, w1, hp, wl, itemsize):
    """Rows of queries per program: amortizes per-program fixed costs on
    the small pyramid levels while keeping the working set well under
    the ~16 MB scoped VMEM and the chunk loop short."""
    for ri in (6, 5, 4, 3, 2):
        if h1 % ri:
            continue
        if ri * w1 > 384:
            continue
        if _vmem_estimate(ri * w1, hp, wl, itemsize) > 10_000_000:
            continue
        return ri
    return 1


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
    Tl, N, h1, w1, hl, wl = vol.shape
    hp = _round_up(hl, ROWPAD)
    if hp != hl:
        vol = jnp.pad(vol, ((0, 0),) * 4 + ((0, hp - hl), (0, 0)))

    ri = _pick_row_group(h1, w1, hp, wl, vol.dtype.itemsize)
    if ri > 1:
        vol = vol.reshape(Tl, N, h1 // ri, ri * w1, hp, wl)
        coords = coords.reshape(Tl, N, h1 // ri, ri * w1, 2)
    out = _lookup_cvjp(vol, coords, radius, interpret)
    return out.reshape(Tl, N, h1, w1, -1)
