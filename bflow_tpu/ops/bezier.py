"""Bezier curve parameterization of continuous-time optical flow.

The model regresses, per pixel, the control points P1..Pn of a degree-n
Bezier curve (P0 == 0, the pixel itself); flow at any time t in [0, 1] is
the curve evaluated at t. This mirrors the reference BezierCurves
(/root/reference/models/raft_spline/bezier.py) with one crucial TPU-native
change: evaluation timestamps are *static* Python floats, so the Bernstein
polynomial coefficients are compile-time constants folded into the jitted
graph — the reference recomputes them on the host (NumPy + numba) and
transfers them to the device on every refinement iteration.

Storage layout is NHWC-friendly: params (N, H, W, degree, 2), last axis
(x, y).  Registered as a pytree so it moves freely through jit/scan/grad.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

TimeLike = Union[float, int, Sequence[float]]


def bezier_coefficients(degree: int, timestamps: Sequence[float]) -> np.ndarray:
    """Bernstein coefficients for control points P1..Pn at given times.

    Returns (T, degree) float64: coeff[t, i-1] = C(n, i) (1-t)^(n-i) t^i.
    P0's term is omitted because P0 == 0 by construction.
    """
    assert degree >= 1
    ts = np.asarray(timestamps, dtype=np.float64)
    assert ts.ndim == 1 and ts.size > 0
    assert ts.min() >= 0.0 and ts.max() <= 1.0
    out = np.empty((ts.size, degree), dtype=np.float64)
    for j in range(degree):
        i = j + 1
        out[:, j] = math.comb(degree, i) * (1.0 - ts) ** (degree - i) * ts**i
    return out


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class BezierCurves:
    """Per-pixel Bezier flow curves; params (N, H, W, degree, 2)."""

    params: jax.Array

    def tree_flatten(self):
        return (self.params,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors ------------------------------------------------------

    @classmethod
    def zeros(
        cls, batch: int, ht: int, wd: int, degree: int, dtype=jnp.float32
    ) -> "BezierCurves":
        assert degree >= 1
        return cls(jnp.zeros((batch, ht, wd, degree, 2), dtype=dtype))

    @classmethod
    def from_flow(cls, flow: jax.Array) -> "BezierCurves":
        """Degree-1 (linear) curve from a 2-view flow field (N, H, W, 2)."""
        assert flow.shape[-1] == 2
        return cls(flow[..., None, :])

    # -- metadata ----------------------------------------------------------

    @property
    def batch(self) -> int:
        return self.params.shape[0]

    @property
    def height(self) -> int:
        return self.params.shape[1]

    @property
    def width(self) -> int:
        return self.params.shape[2]

    @property
    def degree(self) -> int:
        return self.params.shape[3]

    @property
    def dtype(self):
        return self.params.dtype

    # -- updates -----------------------------------------------------------

    def delta_update(self, delta: jax.Array) -> "BezierCurves":
        assert delta.shape == self.params.shape
        return BezierCurves(self.params + delta)

    def stop_gradient(self) -> "BezierCurves":
        """Functional analogue of the reference's in-place detach_()."""
        return BezierCurves(jax.lax.stop_gradient(self.params))

    def astype(self, dtype) -> "BezierCurves":
        return BezierCurves(self.params.astype(dtype))

    # -- evaluation --------------------------------------------------------

    def flow_at(self, times: TimeLike) -> jax.Array:
        """Flow from the reference frame at static time(s) in [0, 1].

        Scalar time -> (N, H, W, 2); sequence of T times -> (T, N, H, W, 2).
        Times must be Python numbers (static): coefficients fold into the
        compiled graph as constants.
        """
        scalar = isinstance(times, (int, float))
        ts: Tuple[float, ...] = (float(times),) if scalar else tuple(
            float(t) for t in times
        )

        flows = []
        for t in ts:
            if t == 0.0:
                flows.append(jnp.zeros_like(self.params[..., 0, :]))
            elif t == 1.0:
                # All Bernstein terms vanish except the last control point.
                flows.append(self.params[..., -1, :])
            else:
                coeff = bezier_coefficients(self.degree, (t,))[0]
                coeff = jnp.asarray(coeff, dtype=self.dtype)
                # Tiny contraction over the degree axis — keep fp32.
                flows.append(
                    jnp.einsum(
                        "nhwpd,p->nhwd",
                        self.params,
                        coeff,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                )
        if scalar:
            return flows[0]
        return jnp.stack(flows, axis=0)

    def upsampled(self, mask: jax.Array, factor: int = 8) -> "BezierCurves":
        """Convex 8x upsampling of all control points jointly."""
        from bflow_tpu.ops.upsample import convex_upsample

        N, H, W, P, _ = self.params.shape
        flat = self.params.reshape(N, H, W, P * 2)
        up = convex_upsample(flat, mask, factor=factor)
        return BezierCurves(up.reshape(N, H * factor, W * factor, P, 2))
