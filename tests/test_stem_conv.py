"""Pallas stem-conv kernel vs the XLA conv oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bflow_tpu.ops.pallas.stem_conv import (
    _stem_xla,
    stem_conv_pallas,
    supported,
)


def _rel(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


@pytest.mark.parametrize(
    "shape,o,kh",
    [((2, 32, 64, 15), 64, 7), ((1, 24, 48, 3), 64, 7),
     ((1, 32, 32, 18), 64, 7),
     ((2, 24, 32, 64), 96, 3),  # stage-2 downsampling conv
     ((1, 16, 24, 96), 128, 3),  # stage-3
     ((1, 12, 28, 64), 96, 3)],  # odd half-width (pad/slice path)
)
def test_stem_forward_matches_xla_conv(rng, shape, o, kh):
    n, h, w, c = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kh, c, o)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(o) * 0.1, jnp.float32)
    assert supported(shape, jnp.bfloat16, kh, kh)

    got = stem_conv_pallas(x.astype(jnp.bfloat16), k, b, True)
    want = _stem_xla(x, k, b)
    assert got.shape == (n, h // 2, w // 2, o)
    assert got.dtype == jnp.bfloat16
    # both sides are bf16 convs with f32 accumulation; they differ only
    # in accumulation order
    assert _rel(got, want) < 2e-2


def test_stem_unsupported_shapes():
    assert not supported((1, 33, 64, 15), jnp.bfloat16)  # odd H
    assert not supported((1, 32, 64, 40), jnp.bfloat16)  # K > budget
    assert not supported((1, 32, 64, 15), None)  # f32 parity mode
    assert not supported((1, 32, 64, 64), jnp.bfloat16, 5, 5)  # kh//2 even


def test_stem_vjp_matches_xla_grads(rng):
    """The custom VJP routes through the XLA conv's own gradients."""
    shape = (1, 16, 32, 15)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((7, 7, 15, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 8, 16, 64)), jnp.float32)

    def f_pal(x, k, b):
        return (stem_conv_pallas(
            x.astype(jnp.bfloat16), k, b, True
        ).astype(jnp.float32) * g).sum()

    def f_ref(x, k, b):
        return (_stem_xla(x, k, b).astype(jnp.float32) * g).sum()

    gp = jax.grad(f_pal, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(gp, gr):
        assert _rel(a, bb) < 2e-2


def test_encoder_with_pallas_stem(rng, monkeypatch):
    """BasicEncoder(stem_pallas=True) through the interpret escape hatch
    equals the default stem up to bf16 accumulation order."""
    monkeypatch.setenv("BFLOW_PALLAS_INTERPRET", "1")
    from bflow_tpu.models.extractor import BasicEncoder

    x = jnp.asarray(rng.standard_normal((2, 32, 48, 15)), jnp.float32)
    enc = BasicEncoder(64, "instance", dtype=jnp.bfloat16)
    var = enc.init(jax.random.PRNGKey(0), x)
    want = enc.apply(var, x)
    enc_p = BasicEncoder(64, "instance", dtype=jnp.bfloat16,
                         stem_pallas=True)
    got = enc_p.apply(var, x)
    assert _rel(got, want) < 5e-2  # norm+resblocks amplify bf16 noise
