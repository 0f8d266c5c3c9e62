"""Pallas TPU kernel: 3x3/stride-1 SAME conv (+bias) for the encoder
residual stages.

Why: the encoders' stage-1 convolutions (64ch at 240x320, reference
architecture /root/reference/models/raft_utils/extractor.py:58-100)
measure ~52 TFLOP/s through XLA's conv lowering — the O=64 output
width half-fills the MXU and the per-tap contraction depth is C. Like
the stem kernel (stem_conv.py), this builds full-depth K = 9*C im2col
patches in VMEM (9 sublane-shifted strip copies per output row, all
offsets static) and runs ONE dense matmul per row group with f32
accumulation.

The row halo comes through a second BlockSpec on the same array offset
by one block, so the standard pallas pipeline double-buffers both
streams. Forward-only kernel; the custom VJP recomputes gradients
through the XLA conv (exact cotangents, off the inference hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_P_BYTES = 2_000_000  # patch scratch budget


def _pick_ri(h: int) -> int:
    # ri >= 2 keeps the one-block halo (1 extra row) inside the i+1 spec
    for cand in (16, 12, 10, 8, 6, 5, 4, 3, 2):
        if h % cand == 0:
            return cand
    return 0


def _rows_per_dot(w: int, c: int, ri: int) -> int:
    g = max(1, _P_BYTES // (w * 9 * c * 2))
    while ri % g:
        g -= 1
    return g


def supported(x_shape, dtype, out_features=None) -> bool:
    n, h, w, c = x_shape
    return (
        dtype == jnp.bfloat16
        and w % 8 == 0
        and c <= 256
        and (out_features is None or out_features >= 32)
        and _pick_ri(h) > 0
    )


def _kernel(x0_ref, x1_ref, w_ref, b_ref, out_ref, p_scr, *, ri, w, g):
    c = x0_ref.shape[-1]
    for r0 in range(0, ri, g):
        for rr in range(g):
            r = r0 + rr
            for dy in range(3):
                k = r + dy
                src = x0_ref if k < ri else x1_ref
                k = k if k < ri else k - ri
                row = src[0, k]  # (w + 2, C)
                for dx in range(3):
                    t = dy * 3 + dx
                    p_scr[rr * w : (rr + 1) * w, t * c : (t + 1) * c] = (
                        row[dx : dx + w, :]
                    )
        acc = jax.lax.dot_general(
            p_scr[:], w_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = (acc + b_ref[0]).astype(out_ref.dtype)
        for rr in range(g):
            out_ref[0, r0 + rr] = o[rr * w : (rr + 1) * w, :]


def _fwd(x, kernel, bias, interpret=False):
    n, h, w, c = x.shape
    o = kernel.shape[-1]
    ri = _pick_ri(h)
    g = _rows_per_dot(w, c, ri)

    xp = jnp.pad(
        x.astype(jnp.bfloat16), ((0, 0), (1, ri), (1, 1), (0, 0))
    )
    wk = kernel.reshape(9 * c, o).astype(jnp.bfloat16)
    bf = bias.reshape(1, o).astype(jnp.float32)

    wp = w + 2
    blk = lambda off: pl.BlockSpec(
        (1, ri, wp, c), lambda ni, i, off=off: (ni, i + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_kernel, ri=ri, w=w, g=g),
        grid=(n, h // ri),
        in_specs=[
            blk(0),
            blk(1),
            pl.BlockSpec((9 * c, o), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ri, w, o), lambda ni, i: (ni, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, o), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((g * w, 9 * c), jnp.bfloat16)],
        interpret=interpret,
    )(xp, xp, wk, bf)


def _conv_xla(x, kernel, bias):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_pallas(x, kernel, bias, interpret=False):
    """3x3/s1 SAME conv + bias, bf16 fast mode (see module docstring).

    Args:
      x: (N, H, W, C), W % 8 == 0, C <= 256.
      kernel: (3, 3, C, O) HWIO (checkpoint layout).
      bias: (O,).
    Returns:
      (N, H, W, O) bf16 — the bf16 XLA conv up to f32 accumulation
      order.
    """
    return _fwd(x, kernel, bias, interpret)


def _vjp_fwd(x, kernel, bias, interpret):
    return _fwd(x, kernel, bias, interpret), (x, kernel, bias)


def _vjp_bwd(interpret, residuals, g):
    x, kernel, bias = residuals
    _, vjp = jax.vjp(_conv_xla, x, kernel, bias)
    dx, dk, db = vjp(g.astype(jnp.bfloat16))
    return (dx.astype(x.dtype), dk.astype(kernel.dtype),
            db.astype(bias.dtype))


conv3x3_pallas.defvjp(_vjp_fwd, _vjp_bwd)
