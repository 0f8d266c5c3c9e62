"""Config composition: groups, overlays, interpolation, mandatory values."""

from pathlib import Path

import pytest

from bflow_tpu.confsys import ConfigError, compose

CONFIG_DIR = Path(__file__).resolve().parent.parent / "bflow_tpu" / "config"


def test_train_compose_dsec_experiment():
    cfg = compose(
        CONFIG_DIR,
        "train",
        [
            "dataset=dsec",
            "model=raft-spline",
            "dataset.path=/data/dsec",
            "wandb.group_name=test",
            "+experiment/dsec/raft_spline=E_LU4_BD2_lowpyramid",
        ],
    )
    # experiment overlay applied at root
    assert cfg["training"]["max_steps"] == 250000
    assert cfg["training"]["multi_loss"] is False
    assert cfg["training"]["limit_val_batches"] == 0
    # interpolation resolved after the overlay changed max_steps
    assert cfg["training"]["lr_scheduler"]["total_steps"] == 250000
    # model group re-selected by the overlay's `override /model`
    assert cfg["model"]["name"] == "raft-spline"
    assert cfg["model"]["use_boundary_images"] is False
    assert cfg["model"]["correlation"]["ev"]["levels"] == [1, 1, 1, 4]
    # group-relative defaults chain: raft-spline <- raft_base <- base
    assert cfg["model"]["num_bins"]["context"] == 5
    assert cfg["model"]["hidden"]["dim"] == 128
    # dataset group at its package
    assert cfg["dataset"]["name"] == "dsec"
    assert cfg["dataset"]["path"] == "/data/dsec"
    assert cfg["dataset"]["extended_voxel_grid"] is True


def test_multiflow_experiment_overrides_bins():
    cfg = compose(
        CONFIG_DIR,
        "train",
        [
            "dataset=multiflow_regen",
            "model=raft-spline",
            "dataset.path=/data/mf",
            "wandb.group_name=g",
            "+experiment/multiflow/raft_spline=E_I_LU5_BD10_lowpyramid",
        ],
    )
    assert cfg["model"]["num_bins"] == {"context": 41, "correlation": 25}
    assert cfg["model"]["bezier_degree"] == 10
    assert cfg["model"]["correlation"]["ev"]["target_indices"] == [
        8, 16, 24, 32, 40,
    ]
    assert cfg["dataset"]["flow_every_n_ms"] == 50


def test_missing_mandatory_raises():
    with pytest.raises(ConfigError, match="dataset.path"):
        compose(
            CONFIG_DIR,
            "train",
            ["dataset=dsec", "model=raft-spline", "wandb.group_name=g"],
        )
    with pytest.raises(ConfigError, match="group choice 'dataset='"):
        compose(CONFIG_DIR, "train", ["model=raft-spline"])


def test_value_override_typing():
    cfg = compose(
        CONFIG_DIR,
        "train",
        [
            "dataset=dsec",
            "model=raft-spline",
            "dataset.path=/d",
            "wandb.group_name=g",
            "training.batch_size=8",
            "hardware.devices=[0,1]",
            "training.lr_scheduler.use=false",
            "model.num_bins.correlation=15",
        ],
    )
    assert cfg["training"]["batch_size"] == 8
    assert cfg["hardware"]["devices"] == [0, 1]
    assert cfg["training"]["lr_scheduler"]["use"] is False
    assert cfg["model"]["num_bins"]["correlation"] == 15


def test_val_config_self_last():
    cfg = compose(
        CONFIG_DIR,
        "val",
        [
            "dataset=dsec",
            "model=raft-spline",
            "dataset.path=/d",
            "checkpoint=/ckpt/x.ckpt",
        ],
    )
    assert cfg["checkpoint"] == "/ckpt/x.ckpt"
    assert cfg["batch_size"] == 8
    assert cfg["hardware"]["num_workers"] == 4


def test_precision_and_runtime_knobs_reach_model_config():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from train import model_config_from

    cfg = compose(
        CONFIG_DIR,
        "train",
        [
            "dataset=dsec", "model=raft-spline", "dataset.path=/d",
            "wandb.group_name=g",
            "model.num_bins.correlation=5",
            "model.precision.corr=bfloat16",
            "model.precision.compute=bfloat16",
            "model.lookup_method=gather",
            "model.remat_updates=true",
        ],
    )
    mc = model_config_from(cfg)
    assert mc.corr_precision == "bfloat16"
    assert mc.compute_dtype == "bfloat16"
    assert mc.lookup_method == "gather"
    assert mc.remat_updates is True
