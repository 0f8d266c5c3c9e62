"""Rendering utilities for training/validation media logging.

Covers the reference's image-logging surface (/root/reference/callbacks/
utils/visualization.py): flow -> RGB (Middlebury wheel), error heatmaps
(clipped coolwarm), red/blue percentile rendering of event
representations, horizontal summary strips, gradient-magnitude bar
charts, and Bezier trajectory plots — rendered with matplotlib instead of
plotly/kaleido (not in this environment).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from bflow_tpu.callbacks.flow_vis import flow_to_color

# per-dataset error-map clipping, reference callbacks/logger.py:33-36
ERROR_CLIP = {"dsec": 3.0, "multiflow2d": 2.0}


def render_event_representation(
    ev_repr: np.ndarray, lo_pct: float = 2.0, hi_pct: float = 98.0
) -> np.ndarray:
    """(H, W) summed event grid -> (H, W, 3) red/blue uint8 rendering.

    Positive mass is red, negative blue, scaled by robust percentiles.
    """
    assert ev_repr.ndim == 2
    img = np.full(ev_repr.shape + (3,), 255, np.uint8)
    pos = ev_repr[ev_repr > 0]
    neg = ev_repr[ev_repr < 0]
    hi = np.percentile(pos, hi_pct) if pos.size else 1.0
    lo = np.percentile(-neg, hi_pct) if neg.size else 1.0
    scale_pos = np.clip(ev_repr / max(hi, 1e-6), 0, 1)
    scale_neg = np.clip(-ev_repr / max(lo, 1e-6), 0, 1)
    img[..., 1] = 255 * (1 - np.maximum(scale_pos, scale_neg))
    img[..., 2] = 255 * (1 - scale_pos)
    img[..., 0] = 255 * (1 - scale_neg)
    return img


def render_error_map(
    pred: np.ndarray,
    gt: np.ndarray,
    valid: Optional[np.ndarray] = None,
    clip: float = 3.0,
) -> np.ndarray:
    """End-point-error heatmap, coolwarm, clipped. (H, W, 3) uint8."""
    import matplotlib.cm as cm

    epe = np.sqrt(((pred - gt) ** 2).sum(-1))
    if valid is not None:
        epe = epe * valid
    norm = np.clip(epe / clip, 0, 1)
    rgba = cm.coolwarm(norm)
    return (rgba[..., :3] * 255).astype(np.uint8)


def summary_image(
    pred_flow: np.ndarray,
    gt_flow: Optional[np.ndarray] = None,
    valid: Optional[np.ndarray] = None,
    ev_repr_sum: Optional[np.ndarray] = None,
    image: Optional[np.ndarray] = None,
    error_clip: float = 3.0,
) -> np.ndarray:
    """Horizontal strip: [events | image | pred | gt | error]."""
    rad_max = None
    if gt_flow is not None:
        rad_max = max(np.sqrt((gt_flow**2).sum(-1)).max(), 1e-6)
    panels: List[np.ndarray] = []
    if ev_repr_sum is not None:
        panels.append(render_event_representation(ev_repr_sum))
    if image is not None:
        panels.append(image.astype(np.uint8))
    panels.append(flow_to_color(pred_flow, rad_max=rad_max))
    if gt_flow is not None:
        panels.append(flow_to_color(gt_flow, rad_max=rad_max))
        panels.append(
            render_error_map(pred_flow, gt_flow, valid, clip=error_clip)
        )
    return np.concatenate(panels, axis=1)


def bezier_trajectory_figure(
    bezier_params: np.ndarray,
    n_points: int = 5,
    n_times: int = 20,
    seed: int = 0,
):
    """Matplotlib figure of sampled per-pixel Bezier trajectories.

    bezier_params: (H, W, degree, 2). Samples `n_points`^2 pixels on a
    grid and draws their continuous-time displacement curves.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from bflow_tpu.ops.bezier import bezier_coefficients

    H, W, degree, _ = bezier_params.shape
    ts = np.linspace(0, 1, n_times)
    coeffs = bezier_coefficients(degree, ts)  # (T, degree)

    fig, axes = plt.subplots(
        n_points, n_points, figsize=(2.2 * n_points, 2.2 * n_points)
    )
    ys = np.linspace(0, H - 1, n_points).astype(int)
    xs = np.linspace(0, W - 1, n_points).astype(int)
    for ai, y in enumerate(ys):
        for aj, x in enumerate(xs):
            ax = axes[ai][aj] if n_points > 1 else axes
            traj = coeffs @ bezier_params[y, x]  # (T, 2)
            ax.plot(traj[:, 0], traj[:, 1], "-o", markersize=2)
            ax.plot([0], [0], "r*", markersize=6)
            ax.set_title(f"({x},{y})", fontsize=6)
            ax.tick_params(labelsize=5)
            ax.invert_yaxis()  # image coordinates
    fig.tight_layout()
    return fig


def grad_flow_figure(named_grad_norms: Sequence):
    """Bar chart of per-parameter gradient magnitudes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = [n for n, _ in named_grad_norms]
    vals = [float(v) for _, v in named_grad_norms]
    fig, ax = plt.subplots(figsize=(max(6, len(names) * 0.25), 4))
    ax.bar(range(len(vals)), vals)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=90, fontsize=4)
    ax.set_ylabel("mean |grad|")
    fig.tight_layout()
    return fig


def figure_to_array(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    import matplotlib.pyplot as plt

    plt.close(fig)
    return buf[..., :3].copy()
