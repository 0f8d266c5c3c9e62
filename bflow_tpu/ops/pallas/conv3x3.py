"""Pallas TPU kernel: small-window stride-1 SAME conv (+bias) — the
encoder residual 3x3s, the update block's 3x3s, and the GRU's 1x5/5x1
gate convolutions.

Why: XLA's TPU conv lowering contracts only the input channels per
spatial tap, so a 64-channel 3x3 at 240x320 measures ~52 TFLOP/s (the
O=64 output width also half-fills the MXU). Like the stem kernel
(stem_conv.py), this builds full-depth K = kh*kw*C im2col patches in
VMEM (kh*kw static sublane-shifted strip copies per output row group)
and runs ONE dense matmul per group with f32 accumulation.

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
_VMEM_BYTES = 8_000_000  # whole-kernel working-set budget


def _pick_ri(h: int, kh: int) -> int:
    # ri >= kh - 1 keeps the one-block row halo inside the i+1 spec
    for cand in (16, 12, 10, 8, 6, 5, 4, 3, 2):
        if h % cand == 0 and cand >= kh - 1:
            return cand
    return 0


def _rows_per_dot(w: int, k: int, ri: int) -> int:
    g = max(1, _P_BYTES // (w * k * 2))
    while ri % g:
        g -= 1
    return g


def supported(x_shape, dtype, out_features=None, kh=3, kw=3) -> bool:
    n, h, w, c = x_shape
    w = _round_up(w, 8)  # the wrapper pads/slices the column axis
    ri = _pick_ri(h, kh)
    if ri == 0 or dtype != jnp.bfloat16:
        return False
    if out_features is not None and out_features < 32:
        return False  # tiny fan-out: the dot would idle the MXU
    k = kh * kw * c
    o = out_features or 128
    vmem = (
        4 * ri * (w + kw - 1) * c * 2  # two double-buffered row blocks
        + min(_P_BYTES, ri * w * k * 2)  # patch scratch
        + k * o * 2  # weights
        + 2 * ri * w * o * 2  # output block
    )
    return vmem < _VMEM_BYTES


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x0_ref, x1_ref, w_ref, b_ref, out_ref, p_scr, *,
            ri, w, g, kh, kw, relu):
    c = x0_ref.shape[-1]
    for r0 in range(0, ri, g):
        for rr in range(g):
            r = r0 + rr
            for dy in range(kh):
                k = r + dy
                src = x0_ref if k < ri else x1_ref
                k = k if k < ri else k - ri
                row = src[0, k]  # (w + kw - 1, C)
                for dx in range(kw):
                    t = dy * kw + dx
                    p_scr[rr * w : (rr + 1) * w, t * c : (t + 1) * c] = (
                        row[dx : dx + w, :]
                    )
        acc = jax.lax.dot_general(
            p_scr[:], w_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0]
        if relu:  # fused epilogue: saves a full HBM round trip
            acc = jnp.maximum(acc, 0.0)
        o = acc.astype(out_ref.dtype)
        for rr in range(g):
            out_ref[0, r0 + rr] = o[rr * w : (rr + 1) * w, :]


def _fwd(x, kernel, bias, interpret=False, relu=False):
    n, h, w0, c = x.shape
    kh, kw, kc, o = kernel.shape
    assert kc == c and kh % 2 == 1 and kw % 2 == 1, (kernel.shape, x.shape)
    # pad the column axis to a sublane multiple; the extra zero input
    # columns only influence the extra output columns, sliced below
    w = _round_up(w0, 8)
    ri = _pick_ri(h, kh)
    g = _rows_per_dot(w, kh * kw * c, ri)

    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (kh // 2, ri), (kw // 2, kw // 2 + w - w0), (0, 0)),
    )
    wk = kernel.reshape(kh * kw * c, o).astype(jnp.bfloat16)
    bf = bias.reshape(1, o).astype(jnp.float32)

    wp = w + kw - 1
    blk = lambda off: pl.BlockSpec(
        (1, ri, wp, c), lambda ni, i, off=off: (ni, i + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, ri=ri, w=w, g=g, kh=kh, kw=kw,
                          relu=relu),
        grid=(n, h // ri),
        in_specs=[
            blk(0),
            blk(1),
            pl.BlockSpec((kh * kw * c, o), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ri, w, o), lambda ni, i: (ni, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, o), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((g * w, kh * kw * c), jnp.bfloat16)
        ],
        interpret=interpret,
    )(xp, xp, wk, bf)
    return out[:, :, :w0, :] if w != w0 else out


def _conv_xla(x, kernel, bias):
    kh, kw = kernel.shape[:2]
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
        (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv2d_pallas(x, kernel, bias, interpret=False, relu=False):
    """Odd-window stride-1 SAME conv + bias, bf16 fast mode.

    Args:
      x: (N, H, W, C), W % 8 == 0; shapes must pass supported().
      kernel: (kh, kw, C, O) HWIO, kh/kw odd (checkpoint layout).
      bias: (O,).
    Returns:
      (N, H, W, O) bf16 — the bf16 XLA conv up to f32 accumulation
      order.
    """
    return _fwd(x, kernel, bias, interpret, relu)


def _vjp_fwd(x, kernel, bias, interpret, relu):
    return _fwd(x, kernel, bias, interpret, relu), (x, kernel, bias)


def _vjp_bwd(interpret, relu, residuals, g):
    x, kernel, bias = residuals
    ref = ((lambda x, k, b: jnp.maximum(_conv_xla(x, k, b), 0))
           if relu else _conv_xla)
    _, vjp = jax.vjp(ref, x, kernel, bias)
    dx, dk, db = vjp(g.astype(jnp.bfloat16))
    return (dx.astype(x.dtype), dk.astype(kernel.dtype),
            db.astype(bias.dtype))


conv2d_pallas.defvjp(_vjp_fwd, _vjp_bwd)

# backwards-compatible alias (the kernel began life as the 3x3 case)
conv3x3_pallas = conv2d_pallas
