"""bilinear_sample parity vs torch grid_sample(align_corners=True, zeros)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from bflow_tpu.ops import bilinear_sample, coords_grid


def torch_grid_sample_pixel(img_np, coords_np):
    """Oracle: sample at pixel coords via normalized grid_sample."""
    B, H, W = img_np.shape
    img = torch.from_numpy(img_np)[:, None]  # (B, 1, H, W)
    coords = torch.from_numpy(coords_np)  # (B, P, Q, 2) pixel (x, y)
    xg = 2 * coords[..., 0] / (W - 1) - 1
    yg = 2 * coords[..., 1] / (H - 1) - 1
    grid = torch.stack([xg, yg], dim=-1)
    out = F.grid_sample(img, grid, align_corners=True)  # zeros padding
    return out[:, 0].numpy()


def test_matches_grid_sample_in_bounds(rng):
    B, H, W = 3, 12, 17
    img = rng.standard_normal((B, H, W)).astype(np.float32)
    coords = np.stack(
        [
            rng.uniform(0, W - 1, (B, 5, 7)),
            rng.uniform(0, H - 1, (B, 5, 7)),
        ],
        axis=-1,
    ).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    want = torch_grid_sample_pixel(img, coords)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matches_grid_sample_out_of_bounds(rng):
    B, H, W = 2, 9, 11
    img = rng.standard_normal((B, H, W)).astype(np.float32)
    # Coordinates straddling and far outside the image in every direction.
    coords = np.stack(
        [
            rng.uniform(-6, W + 5, (B, 8, 8)),
            rng.uniform(-6, H + 5, (B, 8, 8)),
        ],
        axis=-1,
    ).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    want = torch_grid_sample_pixel(img, coords)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_integer_coords_are_exact(rng):
    B, H, W = 1, 6, 6
    img = rng.standard_normal((B, H, W)).astype(np.float32)
    coords = coords_grid(B, H, W)
    got = np.asarray(bilinear_sample(jnp.asarray(img), coords))
    np.testing.assert_allclose(got, img, rtol=0, atol=0)


def test_coords_grid_layout():
    g = np.asarray(coords_grid(2, 3, 4))
    assert g.shape == (2, 3, 4, 2)
    # x varies along width, y along height
    np.testing.assert_array_equal(g[0, 0, :, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(g[0, :, 0, 1], [0, 1, 2])
    np.testing.assert_array_equal(g[0], g[1])
