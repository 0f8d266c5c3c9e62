"""L1 sequence losses with optional validity masks (NHWC, pure functions).

Functional re-design of the reference losses (/root/reference/utils/
losses.py): identical math — per-pixel L1 summed over the channel axis,
masked mean, RAFT exponential iteration weighting gamma^(I-1-i) — but
expressed with where-sums instead of boolean indexing so everything stays
static-shape and jittable.

Layout: predictions/targets (N, H, W, C) (channels last), masks (N, H, W).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def l1_loss_masked(
    source: jax.Array,
    target: jax.Array,
    valid_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean over valid pixels of the channel-summed absolute error."""
    assert source.shape == target.shape, (source.shape, target.shape)
    per_pixel = jnp.abs(source - target).sum(axis=-1)
    if valid_mask is None:
        return per_pixel.mean()
    assert valid_mask.shape == per_pixel.shape, (
        valid_mask.shape,
        per_pixel.shape,
    )
    m = valid_mask.astype(per_pixel.dtype)
    return (per_pixel * m).sum() / jnp.maximum(m.sum(), 1.0)


def l1_seq_loss_masked(
    sources: Sequence[jax.Array],
    target: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    gamma: float = 0.8,
) -> jax.Array:
    """Exponentially weighted sum over refinement iterations (RAFT)."""
    n = len(sources)
    assert n > 0
    loss = 0.0
    for i, src in enumerate(sources):
        loss = loss + gamma ** (n - i - 1) * l1_loss_masked(
            src, target, valid_mask
        )
    return loss


def l1_multi_seq_loss_masked(
    sources: Sequence[Sequence[jax.Array]],
    targets: Sequence[jax.Array],
    valid_masks: Optional[Sequence[jax.Array]] = None,
    gamma: float = 0.8,
) -> jax.Array:
    """Double loop: refinement iterations (outer) x supervision times (inner).

    Per iteration, the mean over the supervision timestamps is taken before
    the exponential iteration weighting — matching the reference multi-loss.
    """
    num_iters = len(sources)
    assert num_iters > 0
    loss = 0.0
    for it, per_iter in enumerate(sources):
        num_targets = len(per_iter)
        assert num_targets == len(targets) and num_targets > 0
        i_loss = 0.0
        for ti, src in enumerate(per_iter):
            mask = valid_masks[ti] if valid_masks is not None else None
            i_loss = i_loss + l1_loss_masked(src, targets[ti], mask)
        i_loss = i_loss / num_targets
        loss = loss + gamma ** (num_iters - it - 1) * i_loss
    return loss
