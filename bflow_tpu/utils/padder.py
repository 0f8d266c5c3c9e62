"""Input padding to x8-divisible spatial sizes (NHWC).

Counterpart of the reference InputPadder (/root/reference/modules/
utils.py:56-105) with its `requires_padding` bug fixed: the reference
initializes `answer = False` and then `&=`, so it always returns False
and the padding path is dead (DSEC's 480x640 happens to be divisible by
8, masking it). Here padding actually engages for non-divisible inputs.

Replicate (edge) padding, split evenly, matching RAFT's SINTEL mode;
`no_top_padding` reproduces the KITTI mode (bottom-only rows).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


class InputPadder:
    def __init__(self, min_size: int = 8, no_top_padding: bool = False):
        assert min_size > 0
        self.min_size = min_size
        self.no_top_padding = no_top_padding

    def requires_padding(self, ht: int, wd: int) -> bool:
        return ht % self.min_size != 0 or wd % self.min_size != 0

    def _pads(self, ht: int, wd: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
        m = self.min_size
        pad_ht = (m - ht % m) % m
        pad_wd = (m - wd % m) % m
        if self.no_top_padding:
            rows = (0, pad_ht)
        else:
            rows = (pad_ht // 2, pad_ht - pad_ht // 2)
        cols = (pad_wd // 2, pad_wd - pad_wd // 2)
        return rows, cols

    def pad(self, x: jax.Array) -> jax.Array:
        """x: (..., H, W, C) NHWC; replicate-pad H and W."""
        ht, wd = x.shape[-3], x.shape[-2]
        rows, cols = self._pads(ht, wd)
        cfg = [(0, 0)] * (x.ndim - 3) + [rows, cols, (0, 0)]
        return jnp.pad(x, cfg, mode="edge")

    def unpad(self, x: jax.Array, ht: int, wd: int) -> jax.Array:
        """Crop back to the original (ht, wd)."""
        rows, cols = self._pads(ht, wd)
        return x[..., rows[0] : rows[0] + ht, cols[0] : cols[0] + wd, :]
