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
            # statistics in f32 regardless of compute dtype
            return instance_norm(x.astype(jnp.float32)).astype(x.dtype)
        if self.kind == "none":
            return x
        raise NotImplementedError(self.kind)


class ResidualBlock(nn.Module):
    planes: int
    norm: str
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        groups = self.planes // 8
        y = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=1,
            kernel_init=kaiming_out, name="conv1", dtype=self.dtype,
        )(x)
        y = Norm(self.norm, groups, dtype=self.dtype, name="norm1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=1, kernel_init=kaiming_out,
            name="conv2", dtype=self.dtype,
        )(y)
        y = Norm(self.norm, groups, dtype=self.dtype, name="norm2")(y, train)
        y = nn.relu(y)

        if self.stride != 1:
            x = nn.Conv(
                self.planes, (1, 1), strides=self.stride,
                kernel_init=kaiming_out, name="ds_conv", dtype=self.dtype,
            )(x)
            x = Norm(self.norm, groups, dtype=self.dtype, name="ds_norm")(x, train)

        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm: str = "batch"
    dtype: Any = None

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

        x = nn.Conv(
            64, (7, 7), strides=2, padding=3, kernel_init=kaiming_out,
            name="conv1", dtype=self.dtype,
        )(x)
        x = Norm(self.norm, num_groups=8, dtype=self.dtype, name="norm1")(x, train)
        x = nn.relu(x)

        for stage, planes in ((1, 64), (2, 96), (3, 128)):
            stride = 1 if stage == 1 else 2
            x = ResidualBlock(
                planes, self.norm, stride, dtype=self.dtype,
                name=f"layer{stage}_0",
            )(x, train)
            x = ResidualBlock(
                planes, self.norm, 1, dtype=self.dtype,
                name=f"layer{stage}_1",
            )(x, train)

        x = nn.Conv(
            self.output_dim, (1, 1), kernel_init=kaiming_out, name="conv2",
            dtype=self.dtype,
        )(x)

        if is_list:
            return [x[i * n : (i + 1) * n] for i in range(parts)]
        return x
