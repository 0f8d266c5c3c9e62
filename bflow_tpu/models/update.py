"""Update block: motion encoder, separable conv GRU, prediction heads.

Architecture mirrors the reference update block (/root/reference/models/
raft_spline/update.py) in NHWC flax.linen. The Bezier parameter channel
layout fed to convolutions is (x_P1..x_Pn, y_P1..y_Pn) — dimension-major,
matching the reference's (CTRL_DIM, degree) view — so imported torch
weights line up channel-for-channel.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bflow_tpu.models.config import RaftSplineConfig
from bflow_tpu.models.extractor import (
    Conv3x3,
    conv_precision,
    dot_1x1,
    dot_im2col,
    kaiming_out,
)


class BezierHead(nn.Module):
    bezier_degree: int
    hidden_dim: int = 256
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv3x3(self.hidden_dim, dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    relu=True, name="conv1")(x)
        # conv2's tiny fan-out (2*degree) always takes the XLA path
        return Conv3x3(self.bezier_degree * 2, dtype=self.dtype,
                       use_pallas=self.use_pallas, name="conv2")(x)


class Conv2dParams(nn.Module):
    """Canonical conv parameters without an attached compute path —
    lets the GRU fuse gate convolutions while keeping the checkpoint
    layout (convz1/kernel, ...) byte-identical."""

    shape: Tuple[int, ...]  # (kh, kw, in, out) HWIO

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kaiming_out, self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


def _dot_1x1(x, kernel, bias, dtype):
    return dot_1x1(x, kernel, bias, dtype)


def _dot_im2col(x, kernel, bias, dtype, use_pallas=False):
    """Small-kernel conv as explicit im2col + matmul (see
    extractor.dot_im2col). For the 7x7 conv over 4 bezier channels
    XLA's conv is ~4x slower than the patch matmul (0.95 vs 0.24 ms at
    B=4, scripts/exp_micro_fixes.py). With use_pallas the patch never
    hits HBM (the pallas conv kernel builds it in VMEM)."""
    if use_pallas:
        import os

        from bflow_tpu.ops.pallas import conv3x3

        kh_, kw_ = kernel.shape[0], kernel.shape[1]
        interp = os.environ.get("BFLOW_PALLAS_INTERPRET", "") == "1"
        if conv3x3.supported(
            x.shape, dtype, kernel.shape[-1], kh_, kw_
        ) and (interp or jax.default_backend() == "tpu"):
            return conv3x3.conv2d_pallas(
                x.astype(dtype), jnp.asarray(kernel), jnp.asarray(bias),
                interp,
            )
    return dot_im2col(x, kernel, bias, dtype)


def _conv(x, kernel, bias, pad, dtype, use_pallas=False):
    if use_pallas:
        import os

        from bflow_tpu.ops.pallas import conv3x3

        kh, kw = kernel.shape[0], kernel.shape[1]
        interp = os.environ.get("BFLOW_PALLAS_INTERPRET", "") == "1"
        if conv3x3.supported(
            x.shape, dtype, kernel.shape[-1], kh, kw
        ) and (interp or jax.default_backend() == "tpu"):
            # pad is SAME for these odd windows by construction
            return conv3x3.conv2d_pallas(
                x.astype(dtype), jnp.asarray(kernel), jnp.asarray(bias),
                interp,
            )
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        bias = bias.astype(dtype)
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=conv_precision(dtype),
    )
    return out + bias


class SepConvGRU(nn.Module):
    """Two-pass gated GRU with separable 1x5 / 5x1 convolutions.

    The three gate convolutions of each pass are algebraically fused
    into one wide conv over [h, x] producing [z | r | q_x] (the q
    kernel's h-columns are zeroed — q's h-contribution needs r*h, which
    only exists after r) plus a small conv for q's r*h term. Exactly the
    reference math with 2 MXU launches per pass instead of 3; the small
    60x80-spatial convs are launch/efficiency-bound on TPU, so wider
    beats more.
    """

    hidden_dim: int = 128
    dtype: Any = None
    fused: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        d = self.hidden_dim
        in_ch = d + x.shape[-1]
        up = self.use_pallas

        def half(h, x, kernel, pad, suffix):
            shape = (*kernel, in_ch, d)
            kz, bz = Conv2dParams(shape, name=f"convz{suffix}")()
            kr, br = Conv2dParams(shape, name=f"convr{suffix}")()
            kq, bq = Conv2dParams(shape, name=f"convq{suffix}")()
            hx = jnp.concatenate([h, x], axis=-1)
            if self.fused:
                # imported params may arrive as NumPy arrays
                kq = jnp.asarray(kq)
                kq_x = kq.at[:, :, :d, :].set(0.0)
                kf = jnp.concatenate([kz, kr, kq_x], axis=-1)
                bf = jnp.concatenate([bz, br, bq])
                zrq = _conv(hx, kf, bf, pad, self.dtype, up)
                z = nn.sigmoid(zrq[..., :d])
                r = nn.sigmoid(zrq[..., d : 2 * d])
                qx = zrq[..., 2 * d :]
                kq_h = kq[:, :, :d, :]
                q = nn.tanh(
                    _conv(r * h.astype(r.dtype), kq_h,
                          jnp.zeros((d,), kq_h.dtype), pad, self.dtype,
                          up)
                    + qx
                )
            else:
                z = nn.sigmoid(_conv(hx, kz, bz, pad, self.dtype, up))
                r = nn.sigmoid(_conv(hx, kr, br, pad, self.dtype, up))
                rhx = jnp.concatenate([r * h.astype(r.dtype), x], axis=-1)
                q = nn.tanh(_conv(rhx, kq, bq, pad, self.dtype, up))
            return (1.0 - z) * h.astype(z.dtype) + z * q

        h = half(h, x, (1, 5), ((0, 0), (2, 2)), "1")  # horizontal pass
        h = half(h, x, (5, 1), ((2, 2), (0, 0)), "2")  # vertical pass
        return h


class BasicMotionEncoder(nn.Module):
    config: RaftSplineConfig

    @nn.compact
    def __call__(self, bezier: jax.Array, corr) -> jax.Array:
        cfg = self.config
        bezier_planes = cfg.bezier_degree * 2
        assert bezier.shape[-1] == bezier_planes

        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        kc1, bc1 = Conv2dParams((1, 1, cfg.corr_planes, 256),
                                name="convc1")()
        if isinstance(corr, (list, tuple)):
            # fused path (config.fuse_corr_conv): contract convc1
            # directly against the per-level lookup outputs —
            # algebraically the concat'd 1x1 conv, with kernel row
            # blocks in the same (level, target, window) channel order,
            # but the ~900-channel corr map never hits HBM. Partials
            # accumulate in f32 (at least as accurate as the one-shot
            # bf16 matmul).
            planes = sum(f.shape[0] * f.shape[-1] for f in corr)
            assert planes == cfg.corr_planes, (planes, cfg.corr_planes)
            k = kc1.reshape(cfg.corr_planes, 256)
            if dt is not None:
                k = k.astype(dt)
            acc, off = None, 0
            for f in corr:
                tl, q = f.shape[0], f.shape[-1]
                blk = k[off : off + tl * q].reshape(tl, q, 256)
                part = jnp.einsum(
                    "tnhwq,tqc->nhwc", f.astype(k.dtype), blk,
                    precision=conv_precision(dt),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
                off += tl * q
            cor = nn.relu(
                (acc + bc1.astype(jnp.float32)).astype(k.dtype)
            )
        else:
            assert corr.shape[-1] == cfg.corr_planes, (
                corr.shape, cfg.corr_planes)
            cor = nn.relu(_dot_1x1(corr, kc1, bc1, dt))
        pc = cfg.pallas_conv
        cor = Conv3x3(192, dtype=dt, use_pallas=pc,
                      relu=True, name="convc2")(cor)
        kf1, bf1 = Conv2dParams((7, 7, bezier_planes, 128),
                                name="convf1")()
        bez = nn.relu(_dot_im2col(bezier, kf1, bf1, dt, pc))
        bez = Conv3x3(64, dtype=dt, use_pallas=pc,
                      relu=True, name="convf2")(bez)

        both = jnp.concatenate([cor, bez], axis=-1)
        out = Conv3x3(cfg.motion_dim - bezier_planes, dtype=dt,
                      use_pallas=pc, relu=True,
                      name="conv")(both)
        return jnp.concatenate([out, bezier.astype(out.dtype)], axis=-1)


class BasicUpdateBlock(nn.Module):
    config: RaftSplineConfig

    @nn.compact
    def __call__(
        self, net: jax.Array, inp: jax.Array, corr: jax.Array,
        bezier: jax.Array,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (new hidden state, upsample mask logits, delta bezier)."""
        cfg = self.config
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        motion = BasicMotionEncoder(cfg, name="encoder")(bezier, corr)
        gru_in = jnp.concatenate([inp.astype(motion.dtype), motion], axis=-1)
        net = SepConvGRU(cfg.hidden_dim, dtype=dt,
                         use_pallas=cfg.pallas_conv,
                         name="gru")(net, gru_in)
        delta = BezierHead(cfg.bezier_degree, dtype=dt,
                           use_pallas=cfg.pallas_conv,
                           name="bezier_head")(net)

        m = Conv3x3(256, dtype=dt, use_pallas=cfg.pallas_conv,
                    relu=True, name="mask_0")(net)
        km, bm = Conv2dParams((1, 1, 256, 64 * 9), name="mask_2")()
        m = _dot_1x1(m, km, bm, dt)
        # gradient-balancing scale, reference update.py:125; heads emit
        # float32 so the Bezier state/upsample stay full precision
        return net, (0.25 * m).astype(jnp.float32), delta.astype(jnp.float32)
