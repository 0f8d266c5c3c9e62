"""DSEC benchmark-submission inference: write per-window flow PNGs.

Runs the model over the DSEC test split (or the train split without
augmentation) and writes predictions in the DSEC submission format —
16-bit PNGs named by file index, encoded as value*128 + 2^15 — one
directory per sequence. The reference repo cannot do this (its test
provider is an unimplemented TODO).

Usage:
  python scripts/predict_dsec.py dataset.path=<DSEC_DIR> \
      checkpoint=<CKPT> output_dir=./submission \
      [model.num_bins.context=15] [+experiment/...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def encode_submission_png(path: Path, flow) -> None:
    import cv2
    import numpy as np

    h, w, _ = flow.shape
    img = np.zeros((h, w, 3), np.uint16)
    img[..., :2] = np.clip(
        flow * 128.0 + 2.0**15, 0, 2**16 - 1
    ).astype(np.uint16)
    img[..., 2] = 1
    ok = cv2.imwrite(str(path), img[..., ::-1])
    assert ok, path


def main(argv=None) -> None:
    import jax
    import numpy as np

    from bflow_tpu.confsys import compose
    from bflow_tpu.data.keys import DataLoading as K
    from bflow_tpu.models import RAFTSpline
    from bflow_tpu.train.checkpoint import restore_weights_only
    from train import build_provider, model_config_from

    overrides = list(argv if argv is not None else sys.argv[1:])
    out_override = [o for o in overrides if o.startswith("output_dir=")]
    output_dir = Path(
        out_override[0].split("=", 1)[1] if out_override else "./submission"
    )
    overrides = [o for o in overrides if not o.startswith("output_dir=")]
    config = compose(
        REPO / "bflow_tpu" / "config",
        "val",
        ["dataset=dsec", "model=raft-spline"] + overrides,
    )

    provider = build_provider(config)
    if config["model"]["num_bins"].get("correlation") is None:
        config["model"]["num_bins"]["correlation"] = (
            provider.get_nbins_correlation()
        )
    cfg = model_config_from(config)
    model = RAFTSpline(cfg)

    # file indices restart per sequence: one output directory each
    sequences = list(provider.iter_test_sequences())
    if not sequences:
        print("no test split found; falling back to train-split inference")
        sequences = [("train_split", provider.get_val_dataset())]

    item0 = sequences[0][1][0]
    import jax.numpy as jnp

    variables = jax.jit(
        lambda v, i: model.init(jax.random.PRNGKey(0), v, i, test_mode=True)
    )(
        jnp.asarray(item0[K.EV_REPR.value])[None],
        jnp.asarray(item0[K.IMG.value])[:, None]
        if cfg.use_images and K.IMG.value in item0
        else None,
    )
    variables = restore_weights_only(config["checkpoint"], variables)

    @jax.jit
    def forward(variables, voxel, images):
        _, up = model.apply(variables, voxel, images, test_mode=True)
        return up.flow_at(1.0)

    total = 0
    for seq_name, dataset in sequences:
        seq_dir = output_dir / seq_name
        seq_dir.mkdir(parents=True, exist_ok=True)
        n = len(dataset)
        print(f"{seq_name}: predicting {n} windows")
        for i in range(n):
            item = dataset[i]
            voxel = jnp.asarray(item[K.EV_REPR.value])[None]
            images = (
                jnp.asarray(item[K.IMG.value])[:, None]
                if cfg.use_images and K.IMG.value in item
                else None
            )
            flow = np.asarray(forward(variables, voxel, images)[0])
            file_index = int(item[K.FILE_INDEX.value])
            encode_submission_png(
                seq_dir / (f"{file_index}".zfill(6) + ".png"), flow
            )
            if (i + 1) % 50 == 0:
                print(f"  {i + 1}/{n}")
        total += n
    print(f"wrote {total} PNGs to {output_dir}")


if __name__ == "__main__":
    main()
