"""convex_upsample parity vs a torch unfold/softmax oracle (NCHW)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from bflow_tpu.ops import convex_upsample


def torch_cvx_upsample(data_np, mask_np):
    """Oracle in the reference's NCHW formulation.

    data_np: (N, dim, H, W); mask_np: (N, 576, H, W).
    """
    data = torch.from_numpy(data_np)
    mask = torch.from_numpy(mask_np)
    N, dim, H, W = data.shape
    mask = mask.view(N, 1, 9, 8, 8, H, W)
    mask = torch.softmax(mask, dim=2)
    up = F.unfold(8 * data, [3, 3], padding=1)
    up = up.view(N, dim, 9, 1, 1, H, W)
    up = torch.sum(mask * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3)
    return up.reshape(N, dim, 8 * H, 8 * W).numpy()


def test_matches_torch_oracle(rng):
    N, H, W, D = 2, 5, 6, 4
    data = rng.standard_normal((N, H, W, D)).astype(np.float32)
    mask = rng.standard_normal((N, H, W, 576)).astype(np.float32)

    got = np.asarray(convex_upsample(jnp.asarray(data), jnp.asarray(mask)))
    assert got.shape == (N, 8 * H, 8 * W, D)

    # NHWC -> NCHW for the oracle. Torch's mask channel c = k*64 + i*8 + j.
    want = torch_cvx_upsample(
        data.transpose(0, 3, 1, 2), mask.transpose(0, 3, 1, 2)
    )
    np.testing.assert_allclose(
        got.transpose(0, 3, 1, 2), want, rtol=1e-5, atol=1e-5
    )


def test_uniform_mask_interpolates_scaled_field(rng):
    # With uniform weights, each fine pixel is the mean of the 3x3 coarse
    # neighbourhood (x8) — zero-padded at the borders.
    N, H, W, D = 1, 4, 4, 2
    data = rng.standard_normal((N, H, W, D)).astype(np.float32)
    mask = np.zeros((N, H, W, 576), dtype=np.float32)
    got = np.asarray(convex_upsample(jnp.asarray(data), jnp.asarray(mask)))
    padded = np.pad(8 * data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for h in range(H):
        for w in range(W):
            mean = padded[:, h : h + 3, w : w + 3].mean(axis=(1, 2))
            np.testing.assert_allclose(
                got[:, 8 * h, 8 * w], mean, rtol=1e-5, atol=1e-5
            )
