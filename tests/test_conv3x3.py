"""Pallas 3x3 conv kernel vs the XLA conv oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bflow_tpu.ops.pallas.conv3x3 import (
    _conv_xla,
    conv3x3_pallas,
    supported,
)


def _rel(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


@pytest.mark.parametrize(
    "shape,o,kh,kw",
    [((2, 16, 32, 64), 64, 3, 3), ((1, 12, 24, 96), 96, 3, 3),
     ((1, 8, 16, 128), 128, 3, 3), ((1, 10, 40, 15), 64, 3, 3),
     ((1, 12, 16, 384), 384, 1, 5),  # fused GRU gate conv, horizontal
     ((1, 12, 16, 384), 384, 5, 1),  # vertical pass
     ((1, 8, 16, 4), 128, 7, 7),  # motion encoder convf1
     ((1, 12, 62, 64), 64, 3, 3)],  # MultiFlow w1=62 (pad/slice path)
)
def test_conv3x3_matches_xla(rng, shape, o, kh, kw):
    n, h, w, c = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kw, c, o)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(o) * 0.1, jnp.float32)
    assert supported(shape, jnp.bfloat16, o, kh, kw)

    got = conv3x3_pallas(x.astype(jnp.bfloat16), k, b, True)
    want = _conv_xla(x, k, b)
    assert got.shape == (n, h, w, o)
    assert _rel(got, want) < 2e-2


def test_conv3x3_unsupported():
    assert not supported((1, 16, 32, 64), jnp.bfloat16, 4)  # tiny fan-out
    assert not supported((1, 16, 32, 64), None)  # f32 parity mode
    # VMEM budget guard: very wide K * O working sets stay on XLA
    assert not supported((1, 16, 640, 512), jnp.bfloat16, 512, 5, 5)
    assert supported((1, 16, 32, 256), jnp.bfloat16, 192)  # update convs
    assert supported((1, 16, 20, 64), jnp.bfloat16)  # W%8 pads+slices


def test_conv3x3_vjp_matches_xla(rng):
    shape, o = (1, 8, 16, 64), 64
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, o)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(o) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal(shape[:3] + (o,)), jnp.float32)

    def f_pal(x, k, b):
        return (conv3x3_pallas(
            x.astype(jnp.bfloat16), k, b, True
        ).astype(jnp.float32) * g).sum()

    def f_ref(x, k, b):
        return (_conv_xla(x, k, b).astype(jnp.float32) * g).sum()

    gp = jax.grad(f_pal, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(gp, gr):
        assert _rel(a, bb) < 2e-2


def test_encoder_conv_pallas_param_compat(rng, monkeypatch):
    """conv_pallas=True keeps the exact parameter tree (Conv3x3 declares
    nn.Conv's kernel/bias layout) and matches the default encoder up to
    bf16 accumulation order."""
    monkeypatch.setenv("BFLOW_PALLAS_INTERPRET", "1")
    from bflow_tpu.models.extractor import BasicEncoder

    x = jnp.asarray(rng.standard_normal((1, 32, 48, 15)), jnp.float32)
    enc = BasicEncoder(64, "instance", dtype=jnp.bfloat16)
    var = enc.init(jax.random.PRNGKey(0), x)
    p = var["params"]["layer1_0"]
    assert p["conv1"]["kernel"].shape == (3, 3, 64, 64)
    assert p["conv1"]["bias"].shape == (64,)

    want = enc.apply(var, x)
    enc_p = BasicEncoder(64, "instance", dtype=jnp.bfloat16,
                         conv_pallas=True)
    got = enc_p.apply(var, x)  # same variables -> same tree expected
    assert _rel(got, want) < 5e-2
