"""Training entry point.

CLI mirrors the reference (/root/reference/train.py, README.md:98-142):

  python train.py dataset=dsec model=raft-spline dataset.path=<DIR> \
      wandb.group_name=dsec +experiment/dsec/raft_spline=E_I_LU4_BD2_lowpyramid

Differences by design: `hardware.gpus` becomes `hardware.devices` (number
of mesh devices; the global batch is sharded over a 1-D data mesh instead
of DDP worker processes), checkpoints are orbax directories under
`logging.out_dir`, and W&B logging degrades to CSV when wandb is absent.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np


def build_provider(config):
    name = config["dataset"]["name"]
    nbins_ctx = config["model"]["num_bins"]["context"]
    if name == "dsec":
        from bflow_tpu.data.dsec.provider import DsecProvider

        return DsecProvider(config["dataset"], nbins_ctx)
    if name == "multiflow_regen":
        from bflow_tpu.data.multiflow2d.provider import MultiflowProvider

        return MultiflowProvider(config["dataset"], nbins_ctx)
    raise NotImplementedError(name)


def model_config_from(config):
    from bflow_tpu.models import RaftSplineConfig

    model_cfg = dict(config["model"])
    precision = model_cfg.get("precision") or {}
    cfg = RaftSplineConfig.from_dict(model_cfg)
    return cfg.__class__(**{
        **cfg.__dict__,
        "corr_precision": precision.get("corr", "float32"),
        "compute_dtype": precision.get("compute", "float32"),
        "lookup_method": model_cfg.get("lookup_method", "auto"),
        "remat_updates": bool(model_cfg.get("remat_updates", False)),
        "scan_iters": bool(model_cfg.get("scan_iters", False)),
        "fuse_corr_conv": bool(model_cfg.get("fuse_corr_conv", False)),
        "onehot_from_level": int(model_cfg.get("onehot_from_level", -1)),
        "pallas_stem": bool(model_cfg.get("pallas_stem", False)),
        "pallas_conv": bool(model_cfg.get("pallas_conv", False)),
    })


def supervision_timestamps(dataset) -> tuple:
    """MultiFlow GT timestamps, read from the first sample (they are
    identical across the dataset by construction)."""
    sample = dataset.sample_list[0]
    gt = sample.get_flow_gt(dataset.delta_ts_flow_ms)
    ts0, ts1 = sample.img_ts
    return tuple((t - ts0) / (ts1 - ts0) for t in gt["timestamps"])


def limit_batches(limit, total: int) -> int:
    if limit is None:
        return total
    if isinstance(limit, float) and limit <= 1.0:
        return int(total * limit)
    return min(int(limit), total)


def main(argv=None) -> None:
    import jax

    from bflow_tpu.confsys import compose
    from bflow_tpu.data.keys import DataLoading as K
    from bflow_tpu.data.loader import make_loader
    from bflow_tpu.parallel.distributed import initialize_distributed
    from bflow_tpu.loggers.csv_logger import CSVLogger
    from bflow_tpu.loggers.wandb_logger import WandbLogger
    from bflow_tpu.models import RAFTSpline
    from bflow_tpu.parallel import make_mesh, replicate, shard_batch
    from bflow_tpu.train import (
        TaskConfig,
        TrainState,
        build_optimizer,
        make_eval_step,
        make_train_step,
    )
    from bflow_tpu.train.step import (
        init_metric_acc,
        metric_acc_means,
        train_metric_keys,
    )
    from bflow_tpu.train.checkpoint import (
        CheckpointManager,
        restore_weights_only,
    )
    from bflow_tpu.utils.metrics import MetricBank

    overrides = list(argv if argv is not None else sys.argv[1:])
    config_dir = Path(__file__).resolve().parent / "bflow_tpu" / "config"
    config = compose(config_dir, "train", overrides)

    # no-op single-process; connects the JAX distributed runtime when a
    # coordinator is configured (multi-host pods)
    initialize_distributed()

    train_cfg = config["training"]
    dataset_name = config["dataset"]["name"]

    provider = build_provider(config)
    # back-fill correlation bins from the dataset (reference
    # modules/data_loading.py:62-68)
    if config["model"]["num_bins"].get("correlation") is None:
        config["model"]["num_bins"]["correlation"] = (
            provider.get_nbins_correlation()
        )
    cfg = model_config_from(config)
    model = RAFTSpline(cfg)

    n_devices = config["hardware"].get("devices") or len(jax.devices())
    mesh = make_mesh(n_devices=n_devices)
    batch_size = int(train_cfg["batch_size"])
    assert batch_size % n_devices == 0, (
        f"training.batch_size={batch_size} must be divisible by the mesh "
        f"size ({n_devices}); set hardware.devices or the batch size "
        f"accordingly"
    )

    train_ds = provider.get_train_dataset()
    num_workers = config["hardware"].get("num_workers") or min(
        2 * batch_size, 16
    )
    loader_kind = config["hardware"].get("loader") or "threaded"
    # Multi-host data feeding: each host loads ONLY its slice of the
    # global batch. Grain shards by jax process internally
    # (ShardByJaxProcess); the threaded loader takes an explicit
    # (rank, world) strided shard of the per-epoch global order.
    # shard_batch() then assembles global arrays from the local shards.
    n_proc = jax.process_count()
    loader_kw = {}
    host_batch = batch_size
    if n_proc > 1:
        assert batch_size % n_proc == 0, (batch_size, n_proc)
        host_batch = batch_size // n_proc
        if loader_kind == "threaded":
            loader_kw["shard"] = (jax.process_index(), n_proc)
    loader = make_loader(
        train_ds,
        kind=loader_kind,
        batch_size=host_batch,
        shuffle=True,
        num_workers=num_workers,
        seed=0,
        **loader_kw,
    )

    if dataset_name == "multiflow_regen":
        task = TaskConfig(
            dataset="multiflow2d",
            multi_loss=bool(train_cfg["multi_loss"]),
            supervision_timestamps=supervision_timestamps(train_ds),
        )
        monitor, mode = "val/epe_multi", "min"
    else:
        task = TaskConfig(dataset="dsec", multi_loss=False)
        monitor, mode = "step", "max"  # DSEC trains without validation

    # -- init / optimizer / state -------------------------------------------
    # peek() instead of next(iter(loader)): probing shapes must not
    # start (and then abandon) the producer pipeline or consume an epoch
    first_batch = loader.peek()
    init_fn = jax.jit(
        lambda v, i: model.init(jax.random.PRNGKey(0), v, i, train=False)
    )
    variables = init_fn(
        first_batch[K.EV_REPR.value],
        first_batch.get(K.IMG.value) if cfg.use_images else None,
    )

    out_dir = Path(config["logging"].get("out_dir", "./runs"))
    run_name = config["wandb"].get("group_name") or "run"
    run_dir = out_dir / f"{run_name}_{dataset_name}"
    ckpt_mgr = CheckpointManager(str(run_dir / "ckpt"), monitor, mode)

    tx, schedule = build_optimizer(train_cfg)
    state = TrainState.create(variables, tx)

    wandb_cfg = config["wandb"]
    csv_logger = CSVLogger(str(run_dir), "train_metrics")
    wb = WandbLogger(
        project=wandb_cfg.get("project_name", "contflow"),
        group=wandb_cfg.get("group_name"),
        run_id=(
            Path(wandb_cfg["wandb_runpath"]).name
            if wandb_cfg.get("wandb_runpath")
            else None
        ),
        config=config,
    )

    # resume: W&B artifact / local path (weights-only or full), then any
    # orbax 'last' in the run dir (reference train.py:93-106,127-130)
    from bflow_tpu.train.checkpoint import resolve_artifact_checkpoint

    ckpt_path = resolve_artifact_checkpoint(wandb_cfg, wb)
    if ckpt_path is not None and wandb_cfg.get("resume_only_weights"):
        variables = restore_weights_only(str(ckpt_path), variables)
        state = TrainState.create(variables, tx)
        print(f"resumed weights from {ckpt_path}")
    restored = ckpt_mgr.restore(state, "last")
    if restored is not None:
        state = restored
        print(f"resumed full training state at step {int(state.step)}")

    state = jax.device_put(state, replicate(mesh))

    log_media = not config["logging"].get("only_numbers", False)
    train_step = jax.jit(
        make_train_step(model, task, tx, with_grad_norms=log_media),
        donate_argnums=0,
    )
    eval_step = jax.jit(make_eval_step(model, task))

    from bflow_tpu.callbacks.logger import MediaLogger

    media = MediaLogger(
        wb,
        task.dataset,
        every_n_steps=int(config["logging"].get("log_every_n_steps", 5000)),
        n_val_predictions=int(
            config["logging"].get("log_n_val_predictions", 2)
        ),
        enabled=log_media,
    )

    max_steps = int(train_cfg["max_steps"])
    max_epochs = int(train_cfg["max_epochs"])
    log_every = int(config["logging"].get("log_every_n_steps", 1000))
    ckpt_every = int(config["logging"].get("ckpt_every_n_epochs", 1))
    n_train = limit_batches(train_cfg.get("limit_train_batches"), len(loader))

    profiler_dir = None
    if config["debugging"].get("profiler") == "jax":
        profiler_dir = str(run_dir / "profile")
        jax.profiler.start_trace(profiler_dir)

    # device-side accumulator: keys are static per task, so only ONE
    # train-step graph is ever compiled
    metric_acc = init_metric_acc(train_metric_keys(task))
    step = int(state.step)
    last_log_step, last_log_time = step, time.time()
    t_start = time.time()
    print(f"training: {n_devices} device(s), batch {batch_size}, "
          f"{n_train} batches/epoch, target {max_steps} steps")

    try:
        for epoch in range(max_epochs):
            loader.set_epoch(epoch)
            for b_idx, batch in enumerate(loader):
                if b_idx >= n_train or step >= max_steps:
                    break
                batch = shard_batch(batch, mesh)
                with mesh:
                    if log_media:
                        state, metric_acc, grad_norms = train_step(
                            state, batch, metric_acc
                        )
                    else:
                        state, metric_acc = train_step(state, batch, metric_acc)
                        grad_norms = None
                step += 1
                if step % log_every == 0 or step == 1:
                    vals = metric_acc_means(metric_acc)
                    vals["learning_rate"] = (
                        float(schedule(step))
                        if callable(schedule)
                        else schedule
                    )
                    now = time.time()
                    vals["steps_per_sec"] = (step - last_log_step) / max(
                        now - last_log_time, 1e-9
                    )
                    last_log_step, last_log_time = step, now
                    csv_logger.log(vals, step)
                    wb.log(vals, step)
                    print(
                        f"step {step}: "
                        + ", ".join(
                            f"{k}={v:.4f}" for k, v in sorted(vals.items())
                        )
                    )
                    metric_acc = init_metric_acc(metric_acc)
                    if media.enabled:
                        with mesh:
                            _, pred, bez_low = eval_step(
                                state.variables, batch
                            )
                        media.on_train_batch(
                            step, jax.device_get(batch),
                            jax.device_get(pred),
                            bezier_params=jax.device_get(bez_low),
                        )
                        if grad_norms is not None:
                            media.on_after_backward(
                                step, jax.device_get(grad_norms)
                            )
                        if wb.enabled:
                            wb.log_histograms(
                                jax.device_get(state.params), step
                            )

            # validation (MultiFlow; DSEC has none — reference parity)
            epoch_metrics = {"step": float(step)}
            if dataset_name == "multiflow_regen" and limit_batches(
                train_cfg.get("limit_val_batches"), 1
            ) > 0:
                val_bank = MetricBank()
                val_loader = make_loader(
                    provider.get_val_dataset(),
                    kind=loader_kind,
                    batch_size=host_batch,
                    shuffle=False,
                    num_workers=num_workers,
                    **loader_kw,
                )
                n_val = limit_batches(
                    train_cfg.get("limit_val_batches"), len(val_loader)
                )
                media.plan_validation(n_val)
                for v_idx, vbatch in enumerate(val_loader):
                    if v_idx >= n_val:
                        break
                    vbatch = shard_batch(vbatch, mesh)
                    with mesh:
                        vmetrics, vpred, vbez = eval_step(
                            state.variables, vbatch
                        )
                    val_bank.update(vmetrics)
                    media.on_validation_batch(
                        step, v_idx, jax.device_get(vbatch),
                        jax.device_get(vpred),
                        bezier_params=jax.device_get(vbez),
                    )
                vvals = val_bank.compute()
                epoch_metrics.update(vvals)
                csv_logger.log(vvals, step)
                wb.log(vvals, step)
                print(f"epoch {epoch} val: "
                      + ", ".join(f"{k}={v:.4f}" for k, v in vvals.items()))

            if (epoch + 1) % ckpt_every == 0:
                info = ckpt_mgr.save(
                    jax.device_get(state), epoch_metrics
                )
                wb.upload_checkpoint(
                    str(run_dir / "ckpt" / "last"), step,
                    score=epoch_metrics.get(monitor),
                )
                print(f"epoch {epoch}: checkpoint saved "
                      f"(best={info['best_score']})")
            if step >= max_steps:
                break
    finally:
        if profiler_dir is not None:
            jax.profiler.stop_trace()
        ckpt_mgr.save(jax.device_get(state), {"step": float(step)})
        ckpt_mgr.close()
        csv_logger.finalize()
        wb.finalize()
    print(f"done at step {step} in {time.time() - t_start:.0f}s")


if __name__ == "__main__":
    main()
