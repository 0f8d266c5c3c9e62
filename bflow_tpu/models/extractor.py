"""Feature/context encoder (RAFT BasicEncoder), flax.linen, NHWC.

Same architecture as the reference encoder (/root/reference/models/
raft_utils/extractor.py): 7x7 stride-2 stem, three two-block residual
stages at 64/96/128 channels (strides 1/2/2), 1x1 output conv — an
overall x8 spatial downsample. Norm is selectable per encoder instance
(group / batch / instance / none) to match the reference's fnet
(instance) and cnet (batch) choices.

TPU notes: NHWC conv layout (the native TPU layout); Kaiming fan-out
initialisation matches the reference init so from-scratch training is
comparable; BatchNorm under a data-parallel `jit` computes batch stats on
the globally sharded batch, so cross-replica stat sync (the reference's
`sync_batchnorm=True`) falls out for free.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

# He/Kaiming normal, fan_out, ReLU gain — reference extractor.py:85-92.
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def conv_precision(dtype):
    """f32 (parity) mode pins convs to HIGHEST — TPU's default conv
    precision is bf16-pass, which would silently break checkpoint-parity
    evaluation. bf16 fast mode keeps the single pass."""
    return jax.lax.Precision.HIGHEST if dtype is None else None


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d with torch defaults (no affine, no running stats):
    per-sample, per-channel normalization over the spatial axes."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class Norm(nn.Module):
    """Selectable normalization layer; `train` only matters for batch."""

    kind: str  # 'group' | 'batch' | 'instance' | 'none'
    num_groups: int = 8
    dtype: Any = None  # computation dtype (None = float32)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.kind == "group":
            return nn.GroupNorm(
                num_groups=self.num_groups, epsilon=1e-5, dtype=self.dtype
            )(x)
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        if self.kind == "instance":
            if self.dtype is None:
                # parity mode: pure f32 statistics
                return instance_norm(x.astype(jnp.float32)).astype(x.dtype)
            # fast mode: single read pass — E[x] and E[x^2] are
            # independent reductions XLA fuses into one traversal,
            # unlike the sequential mean-then-centered-var pair
            # (measured 0.99 -> 0.88 ms per stage-1 norm at 20 inputs,
            # scripts/exp_micro_fixes.py). var = E[x^2] - E[x]^2 in f32
            # is safe here: bf16 activations carry 8 mantissa bits, far
            # below the cancellation error for any plausible mean/var
            # ratio.
            xf = x.astype(jnp.float32)
            m1 = jnp.mean(xf, axis=(1, 2), keepdims=True)
            m2 = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
            var = jnp.maximum(m2 - jnp.square(m1), 0.0)
            return ((xf - m1) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        if self.kind == "none":
            return x
        raise NotImplementedError(self.kind)


class Conv1x1(nn.Module):
    """1x1 conv as (strided subsample +) reshape + matmul, with the
    nn.Conv parameter layout. XLA's conv lowering leaves ~3-6x on the
    table for 1x1 convs at small spatial sizes (measured on the update
    block's convc1, models/update.py:_dot_1x1); a plain dot hits the
    MXU directly, and a strided 1x1 is exactly a subsample + dot."""

    features: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", kaiming_out, (1, 1, x.shape[-1], self.features)
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        if self.stride != 1:
            x = x[:, :: self.stride, :: self.stride, :]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        *lead, ci = x.shape
        y = jnp.matmul(
            x.reshape(-1, ci), kernel.reshape(ci, self.features),
            precision=conv_precision(self.dtype),
        )
        return y.reshape(*lead, self.features) + bias


def dot_1x1(x, kernel, bias, dtype):
    """1x1 conv as reshape+matmul. XLA's TPU conv lowering leaves ~3-6x
    on the table for 1x1 convs at 60x80 spatial (measured 0.53 vs 0.18
    ms for convc1 at B=4, scripts/exp_micro_fixes.py); a plain dot hits
    the MXU directly."""
    *lead, ci = x.shape
    kh, kw, ki, co = kernel.shape
    assert (kh, kw, ki) == (1, 1, ci), (kernel.shape, x.shape)
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        bias = bias.astype(dtype)
    y = jnp.matmul(x.reshape(-1, ci), kernel.reshape(ci, co),
                   precision=conv_precision(dtype))
    return y.reshape(*lead, co) + bias


def dot_im2col(x, kernel, bias, dtype):
    """Small-window SAME conv as explicit im2col + matmul — a dense
    K = kh*kw*ci MXU contraction that stays inside XLA's fusion graph
    (unlike a pallas call). Wins 3-4x per conv in isolation at the
    update block's 60x80 shapes (scripts/exp_dot_convs.py)."""
    n, h, w, ci = x.shape
    kh, kw, ki, co = kernel.shape
    assert ki == ci, (kernel.shape, x.shape)
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        bias = bias.astype(dtype)
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    cols = [
        jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, w, ci))
        for dy in range(kh)
        for dx in range(kw)
    ]
    patch = jnp.concatenate(cols, axis=-1)
    y = jnp.matmul(patch.reshape(-1, kh * kw * ci),
                   kernel.reshape(kh * kw * ci, co),
                   precision=conv_precision(dtype))
    return y.reshape(n, h, w, co) + bias


class Conv3x3(nn.Module):
    """3x3 SAME conv with the nn.Conv parameter layout (kernel HWIO +
    bias), optionally through the pallas patch-matmul kernel
    (ops/pallas/conv3x3.py) when the stride is 1, the shape qualifies
    and the backend is TPU (or the interpret escape hatch is set)."""

    features: int
    stride: int = 1
    dtype: Any = None
    use_pallas: bool = False
    relu: bool = False  # fused epilogue on the pallas path

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", kaiming_out, (3, 3, x.shape[-1], self.features)
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        if self.use_pallas:
            import os

            from bflow_tpu.ops.pallas import conv3x3, stem_conv

            interp = os.environ.get("BFLOW_PALLAS_INTERPRET", "") == "1"
            on_tpu = interp or jax.default_backend() == "tpu"
            if (self.stride == 1 and on_tpu
                    and conv3x3.supported(x.shape, self.dtype,
                                          self.features)):
                return conv3x3.conv2d_pallas(
                    x.astype(self.dtype), jnp.asarray(kernel), bias,
                    interp, self.relu,
                )
            if (self.stride == 2 and on_tpu
                    and stem_conv.supported(x.shape, self.dtype, 3, 3)):
                out = stem_conv.stem_conv_pallas(
                    x.astype(self.dtype), jnp.asarray(kernel), bias,
                    interp,
                )
                return nn.relu(out) if self.relu else out
        xd = x if self.dtype is None else x.astype(self.dtype)
        kd = kernel if self.dtype is None else kernel.astype(self.dtype)
        bd = bias if self.dtype is None else bias.astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            xd, kd, (self.stride, self.stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=conv_precision(self.dtype),
        )
        out = out + bd
        return nn.relu(out) if self.relu else out


class ResidualBlock(nn.Module):
    planes: int
    norm: str
    stride: int = 1
    dtype: Any = None
    conv_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        groups = self.planes // 8
        y = Conv3x3(
            self.planes, stride=self.stride, dtype=self.dtype,
            use_pallas=self.conv_pallas, name="conv1",
        )(x)
        y = Norm(self.norm, groups, dtype=self.dtype, name="norm1")(y, train)
        y = nn.relu(y)
        y = Conv3x3(
            self.planes, dtype=self.dtype,
            use_pallas=self.conv_pallas, name="conv2",
        )(y)
        y = Norm(self.norm, groups, dtype=self.dtype, name="norm2")(y, train)
        y = nn.relu(y)

        if self.stride != 1:
            x = Conv1x1(
                self.planes, stride=self.stride, dtype=self.dtype,
                name="ds_conv",
            )(x)
            x = Norm(self.norm, groups, dtype=self.dtype, name="ds_norm")(x, train)

        return nn.relu(x + y)


class StemConv(nn.Module):
    """The 7x7/stride-2 stem, direct or space-to-depth.

    Declares the canonical (7, 7, C, 64) parameters (checkpoint layout
    unchanged) and either runs the direct strided conv or the exact s2d
    rewrite below. Measured on the v5e the DIRECT conv wins (6.0 vs
    13.3 ms at the 20x480x640x15 flagship shape): XLA lays the s2d
    intermediate out badly for the following conv (an
    optimization_barrier does not recover it — scripts/exp_encoder2.py),
    so the classic rewrite loses despite its friendlier contraction.

    (A round-4 "merged multi-target" mode — one joint conv over the
    union of the event encoder's overlapping voxel slices with a
    densified kernel — was exact but measured 26.41 vs 27.85 fields/s
    end-to-end at B=16 and was removed; see docs/STATUS.md r4 table.)
    """

    features: int = 64
    dtype: Any = None
    use_s2d: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", kaiming_out, (7, 7, x.shape[-1], self.features)
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        if self.use_pallas:
            import os

            from bflow_tpu.ops.pallas import stem_conv

            interp = os.environ.get("BFLOW_PALLAS_INTERPRET", "") == "1"
            if stem_conv.supported(x.shape, self.dtype) and (
                interp or jax.default_backend() == "tpu"
            ):
                return stem_conv.stem_conv_pallas(
                    x.astype(self.dtype), jnp.asarray(kernel), bias,
                    interp,
                )
        if self.use_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            return _stem_conv_s2d(x, kernel, bias, self.dtype)
        xd = x if self.dtype is None else x.astype(self.dtype)
        kd = kernel if self.dtype is None else kernel.astype(self.dtype)
        bd = bias if self.dtype is None else bias.astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            xd, kd, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=conv_precision(self.dtype),
        )
        return out + bd


def _stem_conv_s2d(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                   dtype) -> jax.Array:
    """7x7/stride-2 stem conv as space-to-depth + 4x4/stride-1 conv.

    Bit-equivalent rewrite (classic TPU ResNet optimization): the strided
    7x7 conv's input taps, regrouped by parity, form a 4x4 conv over the
    2x2 space-to-depth transform of the input — larger contraction depth,
    no strided windows, friendlier MXU tiling. Uses the SAME canonical
    (7, 7, C, O) parameters, so checkpoints are untouched.
    """
    N, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0
    xs = x.reshape(N, H // 2, 2, W // 2, 2, C)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(N, H // 2, W // 2, 4 * C)

    O = kernel.shape[-1]
    # pad taps to 8x8 with a zero row/col in FRONT: tap (kh, kw) lands at
    # (a, dy) = ((kh+1)//2, (kh+1)%2) and likewise for kw
    kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    kp = kp.reshape(4, 2, 4, 2, C, O)
    kp = kp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, O)

    if dtype is not None:
        xs = xs.astype(dtype)
        kp = kp.astype(dtype)
        bias = bias.astype(dtype)
    out = jax.lax.conv_general_dilated(
        xs, kp, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=conv_precision(dtype),
    )
    return out + bias


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm: str = "batch"
    dtype: Any = None
    stem_s2d: bool = False  # s2d stem rewrite (exact, but measured slower)
    stem_pallas: bool = False  # pallas s2d patch-matmul stem (bf16)
    conv_pallas: bool = False  # residual 3x3s via the pallas conv kernel

    @nn.compact
    def __call__(
        self,
        x: Union[jax.Array, Sequence[jax.Array]],
        train: bool = False,
    ) -> Union[jax.Array, List[jax.Array]]:
        """x: (N, H, W, C) or a list thereof (batched through one pass)."""
        is_list = isinstance(x, (list, tuple))
        if is_list:
            n = x[0].shape[0]
            parts = len(x)
            x = jnp.concatenate(list(x), axis=0)

        x = StemConv(
            64, dtype=self.dtype, use_s2d=self.stem_s2d,
            use_pallas=self.stem_pallas, name="conv1",
        )(x)
        x = Norm(self.norm, num_groups=8, dtype=self.dtype, name="norm1")(x, train)
        x = nn.relu(x)

        for stage, planes in ((1, 64), (2, 96), (3, 128)):
            stride = 1 if stage == 1 else 2
            x = ResidualBlock(
                planes, self.norm, stride, dtype=self.dtype,
                conv_pallas=self.conv_pallas, name=f"layer{stage}_0",
            )(x, train)
            x = ResidualBlock(
                planes, self.norm, 1, dtype=self.dtype,
                conv_pallas=self.conv_pallas, name=f"layer{stage}_1",
            )(x, train)

        x = Conv1x1(self.output_dim, dtype=self.dtype, name="conv2")(x)

        if is_list:
            return [x[i * n : (i + 1) * n] for i in range(parts)]
        return x
