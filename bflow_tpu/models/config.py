"""Static model configuration.

A frozen, hashable dataclass: it is passed as a static argument through
jit boundaries, so every architectural choice (target indices, pyramid
depths, iteration count) is a compile-time constant — the whole forward
lowers to one static-shape XLA graph.

Field semantics mirror the reference config tree
(/root/reference/config/model/raft-spline.yaml and experiment overlays).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple


@dataclass(frozen=True)
class RaftSplineConfig:
    # temporal binning
    nbins_context: int = 5
    nbins_correlation: int = 5
    bezier_degree: int = 2
    detach_bezier: bool = False

    # input modalities
    use_events: bool = True
    use_images: bool = True

    # event correlation: which context-bin indices are lookup targets and
    # how many pyramid levels each target gets (variable depth).
    ev_target_indices: Tuple[int, ...] = (1, 2, 3, 4)
    ev_levels: Tuple[int, ...] = (1, 1, 1, 4)
    ev_radius: int = 4
    # frame correlation (single target at t=1)
    img_levels: int = 4
    img_radius: int = 4

    # network dims
    hidden_dim: int = 128
    context_dim: int = 128
    feature_dim: int = 256
    motion_dim: int = 128
    feature_norm: str = "instance"
    context_norm: str = "batch"

    # refinement
    iters_train: int = 12
    iters_test: int = 12

    # numerics: "bfloat16" fast path or "float32" parity path for the
    # correlation/feature matmuls. Parameters stay fp32 either way.
    corr_precision: str = "float32"
    # correlation window lookup implementation:
    #   'auto'   — pallas on TPU, gather elsewhere (default)
    #   'pallas' — Pallas DMA kernel (TPU only)
    #   'onehot' — MXU matmul formulation (XLA-only; compiles slowly at
    #              production scale, useful for small shapes)
    #   'gather' — XLA gather (exact oracle; fast on CPU, slow on TPU)
    lookup_method: str = "auto"
    # activation compute dtype for convolutions/GRU ("float32" parity /
    # "bfloat16" fast inference+training). Parameters stay float32.
    compute_dtype: str = "float32"
    # rematerialize the update block in the backward pass: trades ~15%
    # compute for O(iters) activation memory — the TPU-native replacement
    # for the reference's memory-motivated detach_bezier workaround
    remat_updates: bool = False
    # roll the refinement loop into one lax.scan step instead of
    # unrolling `iters` copies of it: ~10x smaller HLO and compile time
    # (the 12-iteration unrolled train step compiled in ~600 s on v5e).
    # Numerics are identical (tests/test_model.py); the iteration body
    # is identical per step, so XLA loses only cross-iteration fusion
    # it could not do anyway (iterations are sequentially dependent).
    scan_iters: bool = False
    # feed the motion encoder's 1x1 corr conv from the per-level lookup
    # outputs as partial-sum einsums instead of materializing the
    # ~900-channel concatenated corr map every iteration (kills one
    # HBM round trip + the per-level transposes; algebraically
    # identical, see scripts/exp_fuse_c1.py)
    fuse_corr_conv: bool = False
    # mixed lookup dispatch: pyramid levels >= this index use the XLA
    # onehot-matmul lookup instead of the pallas slab kernel (only
    # meaningful when the resolved method is pallas/pallas_q8). The
    # deep levels' maps are tiny (15x20, 7x10 at DSEC val), where the
    # pallas call is all fixed cost (grid + selector builds) while the
    # onehot einsums stay small and fuse into the surrounding graph.
    # -1 disables (all levels through the kernel).
    onehot_from_level: int = -1
    # encoders' 7x7/s2 stem through the pallas s2d patch-matmul kernel
    # (ops/pallas/stem_conv.py): full-depth MXU contraction instead of
    # XLA's K=C-per-tap lowering. bf16 fast mode only; shapes the
    # kernel does not support fall back to the XLA conv per call.
    pallas_stem: bool = False
    # encoders' stride-1 residual 3x3 convs through the pallas
    # patch-matmul kernel (ops/pallas/conv3x3.py). Same gating rules
    # as pallas_stem.
    pallas_conv: bool = False
    # Removed after round-4 hardware A/Bs (all in-context losers at
    # B=16 despite 3-4x isolated-op wins; docs/STATUS.md r4 table):
    #   dot_update_convs (23.69 vs 27.85 fields/s) — update-block small
    #     convs as XLA im2col+dot; merged_stem (26.41) — joint
    #     multi-target event stem. Code at git tag-able commit b73bb03.

    def __post_init__(self):
        assert self.nbins_context > 0 and self.nbins_correlation > 0
        assert self.bezier_degree >= 1
        assert self.use_events or self.use_images
        if self.use_events:
            assert len(self.ev_target_indices) > 0
            assert 0 not in self.ev_target_indices
            assert max(self.ev_target_indices) < self.nbins_context
            assert len(self.ev_target_indices) == len(self.ev_levels)
        assert self.ev_radius >= 1 and self.img_radius >= 1

    # -- derived static structure -----------------------------------------

    @property
    def nbins_total(self) -> int:
        return self.nbins_context + self.nbins_correlation - 1

    @property
    def levels_per_target(self) -> Tuple[int, ...]:
        """Pyramid depth per base correlation target (events then frames)."""
        levels: Tuple[int, ...] = ()
        if self.use_events:
            levels += tuple(self.ev_levels)
        if self.use_images:
            levels += (self.img_levels,)
        return levels

    @property
    def num_targets(self) -> int:
        return len(self.levels_per_target)

    @property
    def radius(self) -> int:
        # The reference hardcodes lookup radius 4 for all targets
        # (/root/reference/models/raft_spline/raft.py:38-40).
        return 4

    @property
    def corr_planes(self) -> int:
        """Motion-encoder correlation input channels: sum over targets of
        levels * (2r+1)^2 (/root/reference/models/raft_spline/update.py:69-86)."""
        win = (2 * self.radius + 1) ** 2
        return sum(lvl * win for lvl in self.levels_per_target)

    @property
    def lookup_timestamps(self) -> Tuple[float, ...]:
        """Static per-target Bezier evaluation times (events, then t=1 for
        frames), matching /root/reference/models/raft_spline/raft.py:170-177."""
        ts: Tuple[float, ...] = ()
        if self.use_events:
            dt = 1.0 / (self.nbins_context - 1)
            ts += tuple(dt * idx for idx in self.ev_target_indices)
        if self.use_images:
            ts += (1.0,)
        return ts

    # -- construction from the YAML config tree ----------------------------

    @classmethod
    def from_dict(cls, model_cfg: Dict[str, Any]) -> "RaftSplineConfig":
        corr = model_cfg["correlation"]
        use_images = bool(model_cfg["use_boundary_images"])
        use_events = bool(model_cfg["use_events"])
        ev = corr.get("ev") or {}
        img = corr.get("img") or {}
        kwargs: Dict[str, Any] = dict(
            nbins_context=int(model_cfg["num_bins"]["context"]),
            nbins_correlation=int(model_cfg["num_bins"]["correlation"]),
            bezier_degree=int(model_cfg["bezier_degree"]),
            detach_bezier=bool(model_cfg["detach_bezier"]),
            use_events=use_events,
            use_images=use_images,
            hidden_dim=int(model_cfg["hidden"]["dim"]),
            context_dim=int(model_cfg["context"]["dim"]),
            context_norm=str(model_cfg["context"]["norm"]),
            feature_dim=int(model_cfg["feature"]["dim"]),
            feature_norm=str(model_cfg["feature"]["norm"]),
            motion_dim=int(model_cfg["motion"]["dim"]),
            iters_train=int(model_cfg["num_iter"]["train"]),
            iters_test=int(model_cfg["num_iter"]["test"]),
        )
        if use_events:
            kwargs["ev_target_indices"] = tuple(int(i) for i in ev["target_indices"])
            kwargs["ev_levels"] = tuple(int(v) for v in ev["levels"])
            radii = ev.get("radius")
            if radii:
                kwargs["ev_radius"] = int(radii[0]) if isinstance(radii, (list, tuple)) else int(radii)
        if use_images:
            kwargs["img_levels"] = int(img["levels"])
            kwargs["img_radius"] = int(img["radius"])
        return cls(**kwargs)
