"""RAFT-Spline: recurrent continuous-time flow regression, flax.linen.

Functional re-design of the reference network (/root/reference/models/
raft_spline/raft.py). The forward is a single static XLA graph:

  * voxel-grid slicing, feature extraction and the all-pairs correlation
    volumes happen once per forward;
  * the refinement loop is unrolled over a static iteration count, with
    the per-target Bezier lookup timestamps baked in as compile-time
    constants (the reference recomputes them on the host every iteration);
  * `detach_bezier` becomes `lax.stop_gradient` (exact same gradient
    semantics as the reference's in-place detach_()).

Inputs are NHWC; images come as a (2, N, H, W, 3) stack (reference &
target boundary frames).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from bflow_tpu.models.config import RaftSplineConfig
from bflow_tpu.models.corr import (
    build_pyramid_for_method,
    corr_lookup,
    resolve_lookup_method,
)
from bflow_tpu.models.extractor import BasicEncoder
from bflow_tpu.models.update import BasicUpdateBlock
from bflow_tpu.ops.bezier import BezierCurves
from bflow_tpu.ops.sampler import coords_grid


def _bezier_to_channels(bez: BezierCurves) -> jax.Array:
    """(N,H,W,P,2) -> (N,H,W,2P), dimension-major (x_P1..x_Pn, y_P1..y_Pn)."""
    N, H, W, P, _ = bez.params.shape
    return bez.params.transpose(0, 1, 2, 4, 3).reshape(N, H, W, 2 * P)


def _channels_to_bezier_delta(delta: jax.Array, degree: int) -> jax.Array:
    """(N,H,W,2P) dimension-major -> (N,H,W,P,2) param-tensor layout."""
    N, H, W, C = delta.shape
    assert C == 2 * degree
    return delta.reshape(N, H, W, 2, degree).transpose(0, 1, 2, 4, 3)


class RAFTSpline(nn.Module):
    config: RaftSplineConfig

    def setup(self):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        ps, pc = cfg.pallas_stem, cfg.pallas_conv
        if cfg.use_events:
            self.fnet_ev = BasicEncoder(cfg.feature_dim, cfg.feature_norm,
                                        dtype=dt, stem_pallas=ps,
                                        conv_pallas=pc, name="fnet_ev")
        if cfg.use_images:
            self.fnet_img = BasicEncoder(cfg.feature_dim, cfg.feature_norm,
                                         dtype=dt, stem_pallas=ps,
                                         conv_pallas=pc, name="fnet_img")
        self.cnet = BasicEncoder(cfg.hidden_dim + cfg.context_dim,
                                 cfg.context_norm, dtype=dt,
                                 stem_pallas=ps, conv_pallas=pc,
                                 name="cnet")
        block_cls = (
            nn.checkpoint(BasicUpdateBlock)
            if cfg.remat_updates
            else BasicUpdateBlock
        )
        self.update_block = block_cls(cfg, name="update_block")

    def _gen_voxel_grids(
        self, voxel_grid: jax.Array
    ) -> Tuple[List[jax.Array], jax.Array]:
        """Slice the merged (N,H,W,ctx+corr-1) grid into per-target
        correlation windows (reference index 0 first) + the context grid
        (reference raft.py:88-99)."""
        cfg = self.config
        assert voxel_grid.shape[-1] == cfg.nbins_total, voxel_grid.shape
        grids = [
            voxel_grid[..., idx : idx + cfg.nbins_correlation]
            for idx in (0, *cfg.ev_target_indices)
        ]
        context = voxel_grid[..., -cfg.nbins_context :]
        return grids, context

    def __call__(
        self,
        voxel_grid: Optional[jax.Array] = None,
        images: Optional[jax.Array] = None,
        iters: Optional[int] = None,
        flow_init: Optional[BezierCurves] = None,
        test_mode: bool = False,
        train: bool = False,
    ) -> Union[List[BezierCurves], Tuple[BezierCurves, BezierCurves]]:
        cfg = self.config
        if iters is None:
            iters = cfg.iters_test if test_mode else cfg.iters_train
        assert iters > 0

        fmap_refs: List[jax.Array] = []
        fmap_tgts: List[jax.Array] = []
        context_input = None

        # named scopes mirror the reference's per-stage CudaTimer
        # brackets (raft.py:116-195) for jax.profiler traces — free
        # under jit (pure metadata), visible with debugging.profiler=jax
        # bf16 mode: cast the merged voxel grid ONCE before slicing.
        # The encoders cast their inputs to bf16 internally anyway, so
        # numerics are identical — but casting up front means the five
        # materialized correlation slices move bf16 instead of f32
        # (~2.2 GB less HBM traffic at B=16 flagship shapes).
        compute_dt = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        )
        if cfg.use_events:
            assert voxel_grid is not None
            if compute_dt is not None:
                voxel_grid = voxel_grid.astype(compute_dt)
            with jax.named_scope("fnet_ev"):
                corr_grids, context_input = self._gen_voxel_grids(
                    voxel_grid
                )
                fmaps = self.fnet_ev(corr_grids, train=train)
            if cfg.corr_precision == "float32":
                fmaps = [f.astype(jnp.float32) for f in fmaps]
            ref = fmaps[0]
            for f in fmaps[1:]:
                fmap_refs.append(ref)
                fmap_tgts.append(f)

        if cfg.use_images:
            assert images is not None and images.shape[0] == 2
            imgs = 2.0 * (images.astype(jnp.float32) / 255.0) - 1.0
            if compute_dt is not None:
                imgs = imgs.astype(compute_dt)
            with jax.named_scope("fnet_img"):
                f0, f1 = self.fnet_img([imgs[0], imgs[1]], train=train)
            if cfg.corr_precision == "float32":
                f0 = f0.astype(jnp.float32)
                f1 = f1.astype(jnp.float32)
            fmap_refs.append(f0)
            fmap_tgts.append(f1)
            if context_input is not None:
                context_input = jnp.concatenate(
                    [context_input, imgs[0]], axis=-1
                )
            else:
                context_input = imgs[0]
        assert context_input is not None

        with jax.named_scope("cnet"):
            cnet_out = self.cnet(context_input, train=train)
        net = nn.tanh(cnet_out[..., : cfg.hidden_dim])
        inp = nn.relu(cnet_out[..., cfg.hidden_dim :])

        lookup_method = resolve_lookup_method(cfg.lookup_method)
        with jax.named_scope("corr_volume"):
            pyramid = build_pyramid_for_method(
                jnp.stack(fmap_refs, axis=0),
                jnp.stack(fmap_tgts, axis=0),
                cfg.levels_per_target,
                precision=cfg.corr_precision,
                method=lookup_method,
                onehot_from_level=cfg.onehot_from_level,
            )

        N, H, W, _ = context_input.shape
        assert H % 8 == 0 and W % 8 == 0, (H, W)
        h1, w1 = H // 8, W // 8
        coords0 = coords_grid(N, h1, w1)
        bezier = BezierCurves.zeros(N, h1, w1, cfg.bezier_degree)
        if flow_init is not None:
            bezier = bezier.delta_update(flow_init.params)

        ts = cfg.lookup_timestamps

        def refine(mdl, net, bezier):
            """One refinement iteration (shared by both loop forms)."""
            if cfg.detach_bezier:
                bezier = bezier.stop_gradient()
            flows = bezier.flow_at(ts)  # (T, N, h1, w1, 2)
            coords1 = coords0[None] + flows
            with jax.named_scope("corr_lookup"):
                corr = corr_lookup(
                    pyramid, coords1, cfg.radius,
                    method=lookup_method,
                    precision=cfg.corr_precision,
                    concat=not cfg.fuse_corr_conv,
                    onehot_from_level=cfg.onehot_from_level,
                )
            bez_ch = _bezier_to_channels(bezier)
            with jax.named_scope("update"):
                net, mask, delta = mdl.update_block(net, inp, corr, bez_ch)
            bezier = bezier.delta_update(
                _channels_to_bezier_delta(delta, cfg.bezier_degree)
            )
            return net, bezier, mask

        if cfg.scan_iters and iters > 1:
            # one rolled lax.scan step: ~10x smaller HLO and compile
            # time than unrolling `iters` copies. The carry holds
            # (net, bezier params, last mask); per-iteration params +
            # masks stream out only when the caller needs every
            # prediction (train). Upsampling happens outside the loop
            # so the body stays step-invariant.
            def body(mdl, carry, _):
                net, bez_params, _mask = carry
                net, bez, mask = refine(mdl, net, BezierCurves(bez_params))
                ys = None if test_mode else (bez.params, mask)
                return (net, bez.params, mask), ys

            # the update block's mask head emits float32 (update.py)
            mask0 = jnp.zeros((N, h1, w1, 64 * 9), jnp.float32)
            (net, bez_params, mask), ys = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                length=iters,
            )(self, (net, bezier.params, mask0), None)
            bezier = BezierCurves(bez_params)
            if test_mode:
                with jax.named_scope("upsample"):
                    return bezier, bezier.upsampled(mask)
            params_seq, mask_seq = ys
            predictions = []
            for itr in range(iters):
                with jax.named_scope("upsample"):
                    predictions.append(
                        BezierCurves(params_seq[itr]).upsampled(
                            mask_seq[itr]
                        )
                    )
            return predictions

        predictions: List[BezierCurves] = []
        bezier_up = None
        for itr in range(iters):
            net, bezier, mask = refine(self, net, bezier)
            if not test_mode or itr == iters - 1:
                with jax.named_scope("upsample"):
                    bezier_up = bezier.upsampled(mask)
                predictions.append(bezier_up)

        if test_mode:
            return bezier, bezier_up
        return predictions
