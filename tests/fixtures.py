"""Fabricated miniature datasets following the reference directory contracts
(DSEC: /root/reference/data/dsec/sequence.py:10-27; MultiFlow:
/root/reference/data/multiflow2d/sample.py:14-26)."""

from pathlib import Path

import h5py
import imageio.v2 as iio
import numpy as np


def encode_flow_png(path: Path, flow: np.ndarray, valid: np.ndarray):
    """(H, W, 2) float flow + (H, W) bool -> DSEC 16-bit PNG (via cv2)."""
    import cv2

    h, w, _ = flow.shape
    img = np.zeros((h, w, 3), np.uint16)
    enc = np.clip(flow * 128.0 + 2.0**15, 0, 2**16 - 1).astype(np.uint16)
    img[valid, :2] = enc[valid]
    img[~valid, :2] = 2**15  # decodes to 0; irrelevant (masked)
    img[..., 2] = valid.astype(np.uint16)
    ok = cv2.imwrite(str(path), img[..., ::-1])  # file order (x, y, valid)
    assert ok, path


def make_dsec_sequence(
    root: Path,
    name: str = "zurich_city_00_t",
    n_flows: int = 4,
    height: int = 32,
    width: int = 48,
    with_images: bool = True,
    events_per_window: int = 4000,
    seed: int = 0,
    gap_after: int = None,
):
    """One DSEC recording with `n_flows` 100 ms flow windows; optionally a
    timestamp discontinuity after `gap_after` windows."""
    rng = np.random.default_rng(seed)
    seq = root / name
    (seq / "flow" / "forward").mkdir(parents=True)
    (seq / "events" / "left").mkdir(parents=True)

    t_offset = 10_000_000
    step = 100_000  # 100 ms windows
    starts = []
    t = t_offset + step  # leave one window of events before first flow
    for i in range(n_flows):
        if gap_after is not None and i == gap_after:
            t += 3 * step  # discontinuity
        starts.append(t)
        t += step
    timestamps = np.stack(
        [np.asarray(starts), np.asarray(starts) + step], axis=1
    ).astype(np.int64)
    np.savetxt(
        seq / "flow" / "forward_timestamps.txt",
        timestamps,
        fmt="%d",
        delimiter=",",
    )

    # flow PNGs named by file index 0, 2, 4, ... (100 ms steps)
    for i in range(n_flows):
        flow = rng.uniform(-8, 8, (height, width, 2)).astype(np.float32)
        valid = rng.random((height, width)) > 0.2
        encode_flow_png(
            seq / "flow" / "forward" / (f"{2 * i}".zfill(6) + ".png"),
            flow,
            valid,
        )

    # events across the full span (plus margins for extended windows)
    span_lo = t_offset
    span_hi = timestamps[-1, 1] + step
    n_events = events_per_window * (n_flows + 2)
    t_ev = np.sort(
        rng.integers(span_lo, span_hi, n_events)
    ).astype(np.int64)
    x_ev = rng.integers(0, width, n_events).astype(np.uint16)
    y_ev = rng.integers(0, height, n_events).astype(np.uint16)
    p_ev = rng.integers(0, 2, n_events).astype(np.uint8)

    t_rel = t_ev - t_offset
    total_ms = int(np.ceil((span_hi - t_offset) / 1000)) + 200
    ms_grid = np.arange(total_ms, dtype=np.int64) * 1000
    ms_to_idx = np.searchsorted(t_rel, ms_grid, side="left")

    with h5py.File(str(seq / "events" / "left" / "events.h5"), "w") as h5f:
        h5f.create_dataset("events/t", data=t_rel.astype(np.uint32))
        h5f.create_dataset("events/x", data=x_ev)
        h5f.create_dataset("events/y", data=y_ev)
        h5f.create_dataset("events/p", data=p_ev)
        h5f.create_dataset("ms_to_idx", data=ms_to_idx)
        h5f.create_dataset("t_offset", data=np.int64(t_offset))

    # identity rectification + subpixel jitter (exercises the float path)
    gx, gy = np.meshgrid(np.arange(width), np.arange(height))
    rect = np.stack([gx, gy], axis=-1).astype(np.float32)
    rect += rng.uniform(-0.4, 0.4, rect.shape).astype(np.float32)
    rect[..., 0] = np.clip(rect[..., 0], 0, width - 1)
    rect[..., 1] = np.clip(rect[..., 1], 0, height - 1)
    with h5py.File(
        str(seq / "events" / "left" / "rectify_map.h5"), "w"
    ) as h5f:
        h5f.create_dataset("rectify_map", data=rect)

    if with_images:
        img_dir = seq / "images" / "left" / "ev_inf"
        img_dir.mkdir(parents=True)
        for i in range(n_flows + 2):
            img = rng.integers(0, 255, (height, width, 3)).astype(np.uint8)
            iio.imwrite(str(img_dir / (f"{2 * i}".zfill(6) + ".png")), img)
    return seq


def make_multiflow_sample(
    split_dir: Path,
    name: str = "seq_0001",
    height: int = 32,
    width: int = 48,
    num_bins_context: int = 6,
    n_events: int = 5000,
    seed: int = 0,
):
    rng = np.random.default_rng(seed)
    sample = split_dir / name
    (sample / "events").mkdir(parents=True)
    (sample / "flow").mkdir()
    (sample / "images").mkdir()

    t_ev = np.sort(rng.integers(0, 1_000_000, n_events)).astype(np.uint32)
    with h5py.File(str(sample / "events" / "events.h5"), "w") as h5f:
        h5f.create_dataset("t", data=t_ev)
        h5f.create_dataset(
            "x", data=rng.integers(0, width, n_events).astype(np.uint16)
        )
        h5f.create_dataset(
            "y", data=rng.integers(0, height, n_events).astype(np.uint16)
        )
        h5f.create_dataset(
            "p", data=rng.integers(0, 2, n_events).astype(np.uint8)
        )

    # ground-truth flow every 50 ms from 450 ms to 900 ms
    for ts in range(450_000, 900_001, 50_000):
        flow = rng.uniform(-6, 6, (height, width, 2)).astype(np.float32)
        with h5py.File(
            str(sample / "flow" / (f"{ts}".zfill(7) + ".h5")), "w"
        ) as h5f:
            h5f.create_dataset("flow", data=flow)

    for ts in (400_000, 900_000):
        img = rng.integers(0, 255, (height, width, 3)).astype(np.uint8)
        iio.imwrite(
            str(sample / "images" / (f"{ts}".zfill(7) + ".png")), img
        )
    return sample
