"""Pallas TPU kernel: the encoders' 7x7/stride-2 stem convolution.

Why: XLA's TPU lowering of the stem (reference architecture:
/root/reference/models/raft_utils/extractor.py:58-100) contracts only
the input channels per spatial tap — K = 15/18/3 of the MXU's 128-deep
systolic dimension — so the stem runs at ~24 TFLOP/s (measured 6.0 ms
for the 20x480x640x15 flagship event-encoder batch, ~12% of peak). The
classic space-to-depth rewrite fixes the contraction depth but XLA lays
the s2d intermediate out badly for the following conv (measured 13.3 ms,
see models/extractor.py:StemConv).

This kernel does the s2d rewrite with the layout under our control:

  * Host side (XLA, once): x -> s2d tensor XS (N, H/2, W/2+3, 4*Cp)
    bf16 with channels padded to Cp = roundup(C, 16), plus halo padding
    (2 left/top, 1+ right/bottom) so the kernel sees only static
    unit-stride windows. Weights (7,7,C,O) -> Wk (16*4Cp, O): the exact
    4x4-conv regrouping of the strided 7x7 taps (StemConv's s2d math),
    flattened tap-major.
  * Kernel, per (n, ri output rows) program: for each output row, build
    the im2col patch P (Ws, 16*4Cp) with 16 sublane-shifted strip
    copies (one per 4x4 tap; all offsets static), then ONE dot
    P @ Wk with K = 1024 (C<=16) or 2048 (C<=32) — full MXU
    contraction depth, f32 accumulation.

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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_ri(hs: int) -> int:
    # ri >= 3 so the one-block halo (2 extra rows) stays inside the
    # i+1 BlockSpec; smaller hs falls back to the XLA conv.
    for cand in (16, 12, 10, 8, 6, 5, 4, 3):
        if hs % cand == 0:
            return cand
    return 0


def supported(x_shape, dtype) -> bool:
    """Kernel preconditions: even spatial dims, bf16 fast mode, C<=32."""
    n, h, w, c = x_shape
    return (
        dtype == jnp.bfloat16
        and h % 2 == 0
        and w % 2 == 0
        and c <= 32
        and (w // 2) % 8 == 0
        and _pick_ri(h // 2) > 0
    )


def _s2d_weights(kernel: jax.Array, cp: int) -> jax.Array:
    """(7,7,C,O) -> (16*4Cp, O): strided-7x7 taps regrouped as the 4x4
    s2d conv (same math as extractor._stem_conv_s2d), channels padded
    to Cp with zero rows, flattened (a, b, dy, dx, c) tap-major —
    the order the kernel's patch strips are laid out in."""
    k7 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    c, o = kernel.shape[2], kernel.shape[3]
    k4 = k7.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    # (a, b, dy, dx, c, O) — pad c to cp
    k4 = jnp.pad(k4, ((0, 0),) * 4 + ((0, cp - c), (0, 0)))
    return k4.reshape(16 * 4 * cp, o)


def _s2d_input(x: jax.Array, cp: int, ri: int) -> jax.Array:
    """(N, H, W, C) -> (N, H/2 + ri + 2, W/2 + 3, 4Cp) bf16: channel
    pad, 2x2 space-to-depth ((dy, dx, c) channel order), halo pad of
    (2, ri) rows / (2, 1) cols. The bottom row pad is ri so the
    halo BlockSpec (block index i+1) stays in bounds on the last
    program; the extra zero rows contribute zero taps, which is
    exactly the conv's zero padding."""
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    xs = x.reshape(n, h // 2, 2, w // 2, 2, cp)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * cp)
    xs = jnp.pad(xs, ((0, 0), (2, ri), (2, 1), (0, 0)))
    return xs.astype(jnp.bfloat16)


def _stem_kernel(x0_ref, x1_ref, w_ref, b_ref, out_ref, p_scr, *, ri, ws):
    kc = x0_ref.shape[-1]  # 4*Cp
    for r in range(ri):
        for a in range(4):
            k = r + a
            src = x0_ref if k < ri else x1_ref
            k = k if k < ri else k - ri
            row = src[0, k]  # (ws + 3, 4Cp)
            for b in range(4):
                t = a * 4 + b
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
    o = kernel.shape[-1]
    hs, ws = h // 2, w // 2
    cp = _round_up(c, 16)
    kc = 4 * cp
    ri = _pick_ri(hs)

    xs = _s2d_input(x, cp, ri)
    wk = _s2d_weights(kernel, cp).astype(jnp.bfloat16)
    bf = bias.reshape(1, o).astype(jnp.float32)

    wsp = ws + 3
    blk = lambda off: pl.BlockSpec(
        (1, ri, wsp, kc), lambda ni, i, off=off: (ni, i + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_stem_kernel, ri=ri, ws=ws),
        grid=(n, hs // ri),
        in_specs=[
            blk(0),
            blk(1),
            pl.BlockSpec((16 * kc, o), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ri, ws, o), lambda ni, i: (ni, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hs, ws, o), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((ws, 16 * kc), jnp.bfloat16)],
        interpret=interpret,
    )(xs, xs, wk, bf)
    return out


def _stem_xla(x, kernel, bias):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
        (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def stem_conv_pallas(x, kernel, bias, interpret=False):
    """7x7/stride-2 stem conv, bf16 fast mode (see module docstring).

    Args:
      x: (N, H, W, C) activations, H and W even, C <= 32.
      kernel: (7, 7, C, O) canonical conv weights (checkpoint layout).
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
