"""One-command parity harness for released reference checkpoints.

    python scripts/parity_released.py <ckpt.ckpt> [dataset.path=DIR] \
        [--iters 12] [--times 0.5,1.0] [--skip-torch] [--bf16-also]
        [--q8-also]
    python scripts/parity_released.py --all   # offline 4-family table

Given a PyTorch Lightning checkpoint of the reference (uzh-rpg/bflow,
README.md:67-95 lists the four released files), this:

  1. infers the experiment architecture from the state dict (context /
     correlation bins, Bezier degree, boundary images);
  2. side-by-side oracle check — loads the SAME weights into the actual
     reference torch network (bflow_tpu.importer.reference_oracle) and
     into our model in f32 parity mode, runs identical random inputs,
     and prints max/mean flow deltas at the requested query times
     (works fully offline; demonstrated on a random-init export when
     the released downloads are unreachable);
  3. if `dataset.path=...` is given, runs the full f32-parity
     validation (val.py) on the real dataset and prints the EPE table —
     the "within 1%" BASELINE comparison, ready the moment the released
     checkpoints/datasets are present;
  4. with --bf16-also, repeats our forward in bf16 fast mode against
     the f32 run to quantify fast-mode accuracy end to end.

Reference workflow being mirrored: /root/reference/README.md:98-142.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def infer_config(sd: dict):
    """Experiment architecture from state-dict shapes.

    nbins_correlation = fnet_ev.conv1 in-channels; nbins_context =
    cnet.conv1 in-channels (-3 with images); bezier degree = bezier
    head out-channels / 2; images = fnet_img present. Target indices /
    pyramid levels are not recoverable from shapes — they follow the
    released experiment matrix (reference config/experiment/**)."""
    from bflow_tpu.models import RaftSplineConfig

    use_images = any(k.startswith("net.fnet_img.") for k in sd)
    nbins_corr = sd["net.fnet_ev.conv1.weight"].shape[1]
    nbins_ctx = sd["net.cnet.conv1.weight"].shape[1] - (
        3 if use_images else 0
    )
    degree = sd["net.update_block.bezier_head.conv2.weight"].shape[0] // 2
    if degree <= 2:  # DSEC family: E[_I]_LU4_BD2
        targets, levels = (1, 2, 3, 4), (1, 1, 1, 4)
    else:  # MultiFlow family: E[_I]_LU5_BD10
        targets, levels = (8, 16, 24, 32, 40), (1, 1, 1, 1, 4)
    assert max(targets) < nbins_ctx + nbins_corr, (targets, nbins_ctx)
    name = (
        f"{'E_I' if use_images else 'E'}_LU{len(levels)}_BD{degree}"
        f" (ctx={nbins_ctx}, corr={nbins_corr})"
    )
    cfg = RaftSplineConfig(
        nbins_context=nbins_ctx,
        nbins_correlation=nbins_corr,
        bezier_degree=degree,
        ev_target_indices=targets,
        ev_levels=levels,
        use_events=True,
        use_images=use_images,
    )
    return cfg, name


def load_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v for k, v in sd.items() if k.startswith("net.")}


def our_flow(cfg, sd, voxel_nchw, images_nchw, iters, times, precision,
             lookup_method=None):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bflow_tpu.importer.torch_ckpt import convert_state_dict
    from bflow_tpu.models import RAFTSpline

    cfg = dataclasses.replace(
        cfg, corr_precision=precision, compute_dtype=precision,
        **({"lookup_method": lookup_method} if lookup_method else {}),
    )
    model = RAFTSpline(cfg)
    voxel = jnp.asarray(voxel_nchw.transpose(0, 2, 3, 1))
    images = None
    if cfg.use_images:
        images = jnp.asarray(np.stack(images_nchw).transpose(0, 1, 3, 4, 2))
    variables = model.init(
        jax.random.PRNGKey(0), voxel, images, iters=1, test_mode=True
    )
    variables = convert_state_dict(sd, variables)
    _, up = jax.jit(
        lambda v: model.apply(v, voxel, images, iters=iters, test_mode=True)
    )(variables)
    return {
        t: np.asarray(up.flow_at(float(t))).transpose(0, 3, 1, 2)
        for t in times
    }


def report(tag, got, want):
    for t in sorted(got):
        d = np.abs(got[t] - want[t])
        mag = max(np.abs(want[t]).max(), 1e-8)
        print(
            f"  [{tag}] flow@t={t}: max|d|={d.max():.3e} "
            f"mean|d|={d.mean():.3e} rel={d.max() / mag:.3e} "
            f"(EPE-style mean={np.linalg.norm(got[t] - want[t], axis=1).mean():.4e})"
        )


# The four released checkpoint families (reference README.md:67-95 and
# config/experiment/{dsec,multiflow}/raft_spline/*.yaml). Used by --all
# to synthesize random-init stand-ins when the downloads are blocked.
RELEASED_FAMILIES = (
    ("E_LU4_BD2", dict(nbins_context=15, nbins_correlation=15,
                       bezier_degree=2, ev_target_indices=(1, 2, 3, 4),
                       ev_levels=(1, 1, 1, 4), use_events=True,
                       use_images=False)),
    ("E_I_LU4_BD2", dict(nbins_context=15, nbins_correlation=15,
                         bezier_degree=2, ev_target_indices=(1, 2, 3, 4),
                         ev_levels=(1, 1, 1, 4), use_events=True,
                         use_images=True)),
    ("E_LU5_BD10", dict(nbins_context=41, nbins_correlation=25,
                        bezier_degree=10,
                        ev_target_indices=(8, 16, 24, 32, 40),
                        ev_levels=(1, 1, 1, 1, 4), use_events=True,
                        use_images=False)),
    ("E_I_LU5_BD10", dict(nbins_context=41, nbins_correlation=25,
                          bezier_degree=10,
                          ev_target_indices=(8, 16, 24, 32, 40),
                          ev_levels=(1, 1, 1, 1, 4), use_events=True,
                          use_images=True)),
)


def random_init_state_dict(cfg, seed: int) -> dict:
    """Random-init torch reference export for one family — the offline
    stand-in for a released .ckpt (egress to download.ifi.uzh.ch is
    blocked in this environment; verified 2026-08-20, see
    docs/STATUS.md)."""
    import torch

    from bflow_tpu.importer.reference_oracle import (
        load_reference_raft,
        model_params_dict,
    )

    torch.manual_seed(seed)
    net = load_reference_raft()(model_params_dict(cfg)).eval()
    out = {}
    for k, v in net.state_dict().items():
        a = v.detach().cpu().numpy()
        # Damp conv/linear weights 20x: the UNTRAINED reference blows up
        # to NaN by ~8 refinement iterations at its native init scale
        # (measured 2026-08-20); 0.05x keeps all 12 iterations finite,
        # the same regime the importer round-trip tests use. Norm
        # parameters (1-D) stay untouched.
        if a.ndim >= 2 and a.dtype.kind == "f":
            a = a * 0.05
        out["net." + k] = a
    return out


def run_family(name: str, sd: dict, cfg, iters: int, times, size) -> float:
    """One side-by-side row: ours-f32 vs the torch reference oracle on
    identical random inputs. Returns the max relative flow delta."""
    H, W = size
    rng = np.random.default_rng(3)
    voxel = rng.standard_normal((1, cfg.nbins_total, H, W)).astype(
        np.float32
    )
    images = [
        rng.integers(0, 255, (1, 3, H, W)).astype(np.float32)
        for _ in range(2)
    ]
    ours = our_flow(sd=sd, cfg=cfg, voxel_nchw=voxel, images_nchw=images,
                    iters=iters, times=times, precision="float32")

    from bflow_tpu.importer.reference_oracle import torch_forward_flow

    want = torch_forward_flow(cfg, sd, voxel, images, iters=iters,
                              times=times)
    report(name, ours, want)
    return max(
        float(np.abs(ours[t] - want[t]).max()
              / max(np.abs(want[t]).max(), 1e-8))
        for t in times
    )


def run_all(args) -> None:
    """--all: the full 4-family parity table (VERDICT r4 #6). Offline
    proof that the released-checkpoint EPE comparison is one command
    away: each family runs the ACTUAL torch reference (random init,
    exported exactly like a released .ckpt's state dict) against our
    f32 parity mode at the released iteration count."""
    import jax

    # f32 CPU parity run — stay off the TPU (the axon sitecustomize
    # pins JAX_PLATFORMS, so the env var alone is ignored)
    jax.config.update("jax_platforms", "cpu")

    from bflow_tpu.models import RaftSplineConfig

    times = tuple(float(t) for t in args.times.split(","))
    rows = []
    for seed, (name, kw) in enumerate(RELEASED_FAMILIES):
        cfg = RaftSplineConfig(**kw)
        sd = random_init_state_dict(cfg, seed)
        rel = run_family(name, sd, cfg, args.iters, times, args.size)
        rows.append((name, rel))
    print()
    print(f"{'family':16s} {'max rel flow delta':>20s}  verdict "
          f"({args.iters} iters, f32)")
    ok = True
    for name, rel in rows:
        verdict = "PASS" if rel <= 1e-3 else "FAIL"
        ok &= rel <= 1e-3
        print(f"{name:16s} {rel:20.3e}  {verdict}")
    print("(random-init reference exports — released .ckpt downloads "
          "are unreachable from this environment; rerun with the real "
          "files + dataset.path=... for the BASELINE EPE table)")
    if not ok:
        sys.exit(1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", default=None,
                    help="reference .ckpt file (omit with --all)")
    ap.add_argument("--all", action="store_true",
                    help="offline 4-family parity table from random-init "
                         "reference exports")
    ap.add_argument("overrides", nargs="*",
                    help="val.py overrides, e.g. dataset.path=...")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--times", default="1.0")
    # 128x128 minimum for the deg-2/deg-10 low-pyramid families: at
    # 96x96 the level-3 map is 1x1 and torch grid_sample's
    # align_corners normalization divides by (W-1)=0 -> NaN.
    ap.add_argument("--size", type=int, nargs=2, default=(128, 128))
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--bf16-also", action="store_true")
    ap.add_argument("--q8-also", action="store_true")
    args = ap.parse_args()

    if args.all:
        run_all(args)
        return
    if args.ckpt is None:
        ap.error("a .ckpt path is required unless --all is given")

    sd = load_state_dict(args.ckpt)
    cfg, name = infer_config(sd)
    times = tuple(float(t) for t in args.times.split(","))
    print(f"checkpoint: {args.ckpt}")
    print(f"inferred architecture: {name}")

    H, W = args.size
    rng = np.random.default_rng(3)
    voxel = rng.standard_normal((1, cfg.nbins_total, H, W)).astype(
        np.float32
    )
    images = [
        rng.integers(0, 255, (1, 3, H, W)).astype(np.float32)
        for _ in range(2)
    ]

    ours_f32 = our_flow(
        sd=sd, cfg=cfg, voxel_nchw=voxel, images_nchw=images,
        iters=args.iters, times=times, precision="float32",
    )

    from bflow_tpu.importer.reference_oracle import (
        reference_available,
        torch_forward_flow,
    )

    if not args.skip_torch and reference_available():
        want = torch_forward_flow(
            cfg, sd, voxel, images, iters=args.iters, times=times
        )
        print(f"torch-oracle side-by-side ({args.iters} iters, f32):")
        report("ours-f32 vs torch", ours_f32, want)
    else:
        print("torch oracle skipped (reference tree unavailable or "
              "--skip-torch)")

    if args.bf16_also or args.q8_also:
        ours_bf16 = our_flow(
            sd=sd, cfg=cfg, voxel_nchw=voxel, images_nchw=images,
            iters=args.iters, times=times, precision="bfloat16",
        )
        print("bf16 fast mode vs our f32 parity mode:")
        report("bf16 vs f32", ours_bf16, ours_f32)
    if args.q8_also:
        # int8 volume inference mode (TPU only: the q8 slab kernel)
        ours_q8 = our_flow(
            sd=sd, cfg=cfg, voxel_nchw=voxel, images_nchw=images,
            iters=args.iters, times=times, precision="bfloat16",
            lookup_method="pallas_q8",
        )
        print("q8 volume mode vs bf16 fast mode:")
        report("q8 vs bf16", ours_q8, ours_bf16)

    ds_overrides = [o for o in args.overrides if "=" in o]
    if ds_overrides:
        print("running full f32-parity validation (val.py)...")
        import val

        exp = (
            "+experiment/dsec/raft_spline="
            f"{'E_I' if cfg.use_images else 'E'}_LU4_BD2_lowpyramid"
            if cfg.bezier_degree <= 2
            else "+experiment/multiflow/raft_spline="
            f"{'E_I' if cfg.use_images else 'E'}_LU5_BD10_lowpyramid"
        )
        dataset = (
            "dataset=dsec" if cfg.bezier_degree <= 2
            else "dataset=multiflow_regen"
        )
        val.main(
            [
                dataset,
                "model=raft-spline",
                exp,
                f"checkpoint={args.ckpt}",
                "model.precision.corr=float32",
                "model.precision.compute=float32",
                *ds_overrides,
            ]
        )
    else:
        print("no dataset.path given — skipped real-data EPE validation "
              "(pass dataset.path=... when the dataset is available)")


if __name__ == "__main__":
    main()
