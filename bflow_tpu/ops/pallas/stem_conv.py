"""Pallas TPU kernel: odd-window stride-2 SAME convolutions — the
encoders' 7x7 stem and the residual stages' 3x3 downsampling convs.

Why: XLA's TPU lowering of these convs contracts only the input
channels per spatial tap — K = 15/18/3 of the MXU's 128-deep systolic
dimension for the stem (reference architecture: /root/reference/models/
raft_utils/extractor.py:58-100) — so the stem runs at ~24 TFLOP/s
(measured 6.0 ms for the 20x480x640x15 flagship event-encoder batch).
The classic space-to-depth rewrite fixes the contraction depth but XLA
lays the s2d intermediate out badly for the following conv (measured
13.3 ms, see models/extractor.py:StemConv).

This kernel does the s2d rewrite with the layout under our control:

  * Host side (XLA, once): x -> s2d tensor XS (N, H/2, W/2 + halo,
    4*Cp) bf16 with channels padded to Cp = roundup(C, 16) and halo
    padding so the kernel sees only static unit-stride windows.
    Weights (kh,kw,C,O) -> Wk (ta*tb*4Cp, O): the exact (ta x tb)-tap
    regrouping of the strided taps over the 2x2 s2d phases, flattened
    tap-major. kh//2 must be odd (kh in {3, 7, 11, ...}) so the tap
    parity maps cleanly onto the s2d phases.
  * Kernel, per (n, ri output rows) program: for each output row,
    build the im2col patch P (Ws, ta*tb*4Cp) with ta*tb sublane-shifted
    strip copies (all offsets static), then ONE dot P @ Wk — full MXU
    contraction depth (K = 1024 for the 7x7 stems, 1024/1536 for the
    3x3 stage convs), f32 accumulation.

The row halo is fetched through a second BlockSpec on the same array
offset by one block (standard overlap trick), so the pallas pipeline
keeps double-buffering both streams.

Forward-only kernel; the custom VJP recomputes gradients through the
XLA reference formulation (jax.vjp of the direct conv), so training
uses the fast forward and XLA's well-tested conv gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K_MAX = 2048  # contraction-depth cap (weights + patch VMEM budget)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _taps(k: int):
    """Odd window k (k//2 odd) -> (tap count, top/left s2d pad)."""
    assert k % 2 == 1 and (k // 2) % 2 == 1, k
    return (k + 1) // 2, (k // 2 + 1) // 2


def _pick_ri(hs: int, ta: int) -> int:
    # ri >= ta - 1 keeps the one-block row halo inside the i+1 spec
    for cand in (16, 12, 10, 8, 6, 5, 4, 3):
        if hs % cand == 0 and cand >= ta - 1:
            return cand
    return 0


def supported(x_shape, dtype, kh: int = 7, kw: int = 7) -> bool:
    """Kernel preconditions: even spatial dims, bf16 fast mode, odd
    windows with kh//2 odd, contraction depth within budget."""
    n, h, w, c = x_shape
    if kh % 2 == 0 or kw % 2 == 0 or (kh // 2) % 2 == 0:
        return False
    ta, _ = _taps(kh)
    tb, _ = _taps(kw)
    k = ta * tb * 4 * _round_up(c, 16)
    return (
        dtype == jnp.bfloat16
        and h % 2 == 0
        and w % 2 == 0
        and k <= _K_MAX
        and _pick_ri(h // 2, ta) > 0
    )


def _s2d_weights(kernel: jax.Array, cp: int) -> jax.Array:
    """(kh,kw,C,O) -> (ta*tb*4Cp, O): strided taps regrouped as the
    (ta x tb) conv over the 2x2 space-to-depth phases (same math as
    extractor._stem_conv_s2d), channels padded to Cp with zero rows,
    flattened (a, b, dy, dx, c) tap-major — the order the kernel's
    patch strips are laid out in."""
    kh, kw, c, o = kernel.shape
    ta, _ = _taps(kh)
    tb, _ = _taps(kw)
    kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k4 = kp.reshape(ta, 2, tb, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    k4 = jnp.pad(k4, ((0, 0),) * 4 + ((0, cp - c), (0, 0)))
    return k4.reshape(ta * tb * 4 * cp, o)


def _s2d_input(x, cp, ri, oh, ow, wpad) -> jax.Array:
    """(N, H, W, C) -> (N, H/2 + oh + ri, W/2 + ow + wpad, 4Cp) bf16:
    channel pad, 2x2 space-to-depth ((dy, dx, c) channel order), halo
    pad. The bottom row pad is ri so the halo BlockSpec (block index
    i+1) stays in bounds on the last program; all pad contributes zero
    taps = the conv's zero padding."""
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    xs = x.reshape(n, h // 2, 2, w // 2, 2, cp)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * cp)
    xs = jnp.pad(xs, ((0, 0), (oh, ri), (ow, wpad), (0, 0)))
    return xs.astype(jnp.bfloat16)


def _stem_kernel(x0_ref, x1_ref, w_ref, b_ref, out_ref, p_scr, *,
                 ri, ws, ta, tb):
    kc = x0_ref.shape[-1]  # 4*Cp
    for r in range(ri):
        for a in range(ta):
            k = r + a
            src = x0_ref if k < ri else x1_ref
            k = k if k < ri else k - ri
            row = src[0, k]  # (wsp, 4Cp)
            for b in range(tb):
                t = a * tb + b
                p_scr[:, t * kc : (t + 1) * kc] = row[b : b + ws, :]
        acc = jax.lax.dot_general(
            p_scr[:], w_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, r] = (acc + b_ref[0]).astype(out_ref.dtype)


def _stem_fwd(x: jax.Array, kernel: jax.Array, bias: jax.Array,
              interpret: bool = False) -> jax.Array:
    n, h, w, c = x.shape
    kh, kw, _, o = kernel.shape
    ta, oh = _taps(kh)
    tb, ow = _taps(kw)
    hs, ws0 = h // 2, w // 2
    ws = _round_up(ws0, 8)  # output columns beyond ws0 are sliced off
    cp = _round_up(c, 16)
    kc = 4 * cp
    kdim = ta * tb * kc
    ri = _pick_ri(hs, ta)

    # right halo: tap b reads padded cols [b, b+ws) <-> original
    # [b-ow, b-ow+ws); max original col = tb-1-ow + ws-1
    wpad = (tb - 1 - ow) + (ws - ws0)
    xs = _s2d_input(x, cp, ri, oh, ow, wpad)
    wk = _s2d_weights(kernel, cp).astype(jnp.bfloat16)
    bf = bias.reshape(1, o).astype(jnp.float32)

    wsp = ws + tb - 1
    blk = lambda off: pl.BlockSpec(
        (1, ri, wsp, kc), lambda ni, i, off=off: (ni, i + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_stem_kernel, ri=ri, ws=ws, ta=ta, tb=tb),
        grid=(n, hs // ri),
        in_specs=[
            blk(0),
            blk(1),
            pl.BlockSpec((kdim, o), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ri, ws, o), lambda ni, i: (ni, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hs, ws, o), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((ws, kdim), jnp.bfloat16)],
        interpret=interpret,
    )(xs, xs, wk, bf)
    return out[:, :, :ws0, :] if ws != ws0 else out


def _stem_xla(x, kernel, bias):
    kh, kw = kernel.shape[:2]
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
        (2, 2), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def stem_conv_pallas(x, kernel, bias, interpret=False):
    """Odd-window stride-2 SAME conv, bf16 fast mode (see module doc).

    Args:
      x: (N, H, W, C) activations, H and W even; shapes must pass
        supported().
      kernel: (kh, kw, C, O) canonical conv weights (checkpoint
        layout), kh//2 and kw//2 odd (7x7 stems, 3x3 stage convs).
      bias: (O,).
    Returns:
      (N, H/2, W/2, O) bf16 — numerically the bf16 XLA conv up to f32
      accumulation order.
    """
    return _stem_fwd(x, kernel, bias, interpret)


def _vjp_fwd(x, kernel, bias, interpret):
    return _stem_fwd(x, kernel, bias, interpret), (x, kernel, bias)


def _vjp_bwd(interpret, residuals, g):
    # gradients through the reference XLA formulation: the forward is
    # algebraically the same conv, so these are the exact cotangents
    # (and XLA's conv grads are fast enough off the inference path)
    x, kernel, bias = residuals
    _, vjp = jax.vjp(_stem_xla, x, kernel, bias)
    dx, dk, db = vjp(g.astype(jnp.bfloat16))
    return (dx.astype(x.dtype), dk.astype(kernel.dtype),
            db.astype(bias.dtype))


stem_conv_pallas.defvjp(_vjp_fwd, _vjp_bwd)
