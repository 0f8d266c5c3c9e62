"""BezierCurves evaluation vs closed-form Bernstein polynomials."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import special

from bflow_tpu.ops import BezierCurves, bezier_coefficients


def scipy_bezier_eval(params, t):
    """Oracle: params (N, H, W, degree, 2), scalar t."""
    degree = params.shape[3]
    flow = np.zeros(params.shape[:3] + (2,), dtype=np.float64)
    for i in range(1, degree + 1):
        c = special.binom(degree, i) * (1 - t) ** (degree - i) * t**i
        flow += c * params[..., i - 1, :]
    return flow


def test_coefficients_match_scipy():
    for degree in (1, 2, 5, 10):
        ts = np.linspace(0, 1, 7)
        got = bezier_coefficients(degree, ts)
        want = np.stack(
            [
                special.binom(degree, np.arange(1, degree + 1))
                * (1 - t) ** (degree - np.arange(1, degree + 1))
                * t ** np.arange(1, degree + 1)
                for t in ts
            ]
        )
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_flow_at_scalar_and_endpoints(rng):
    params = rng.standard_normal((2, 4, 5, 3, 2)).astype(np.float32)
    bez = BezierCurves(jnp.asarray(params))

    np.testing.assert_array_equal(np.asarray(bez.flow_at(0.0)), 0.0)
    np.testing.assert_allclose(
        np.asarray(bez.flow_at(1.0)), params[..., -1, :], rtol=0
    )
    for t in (0.25, 0.5, 0.9):
        np.testing.assert_allclose(
            np.asarray(bez.flow_at(t)),
            scipy_bezier_eval(params, t),
            rtol=1e-5,
            atol=1e-6,
        )


def test_flow_at_sequence(rng):
    params = rng.standard_normal((1, 3, 3, 10, 2)).astype(np.float32)
    bez = BezierCurves(jnp.asarray(params))
    ts = [0.2, 0.4, 0.6, 0.8, 1.0]
    flows = np.asarray(bez.flow_at(ts))
    assert flows.shape == (5, 1, 3, 3, 2)
    for k, t in enumerate(ts):
        np.testing.assert_allclose(
            flows[k], scipy_bezier_eval(params, t), rtol=1e-5, atol=1e-6
        )


def test_pytree_roundtrip_and_updates(rng):
    bez = BezierCurves.zeros(2, 4, 4, 2)
    leaves, treedef = jax.tree_util.tree_flatten(bez)
    assert len(leaves) == 1
    bez2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(bez2, BezierCurves)

    delta = jnp.ones_like(bez.params)
    updated = bez.delta_update(delta)
    np.testing.assert_array_equal(np.asarray(updated.params), 1.0)

    # stop_gradient kills the pullback
    def f(p):
        b = BezierCurves(p).stop_gradient()
        return b.flow_at(1.0).sum()

    grad = jax.grad(f)(bez.params)
    np.testing.assert_array_equal(np.asarray(grad), 0.0)


def test_degree1_from_flow(rng):
    flow = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    bez = BezierCurves.from_flow(jnp.asarray(flow))
    # Degree-1 Bezier is linear: flow(t) = t * P1
    np.testing.assert_allclose(
        np.asarray(bez.flow_at(0.5)), 0.5 * flow, rtol=1e-6
    )
