from bflow_tpu.ops.sampler import bilinear_sample, coords_grid
from bflow_tpu.ops.upsample import convex_upsample
from bflow_tpu.ops.bezier import BezierCurves, bezier_coefficients

__all__ = [
    "bilinear_sample",
    "coords_grid",
    "convex_upsample",
    "BezierCurves",
    "bezier_coefficients",
]
