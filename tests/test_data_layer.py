"""Data layer: voxel rasterizer oracle, event slicer, providers, loader."""

from pathlib import Path

import numpy as np
import pytest
import torch

from bflow_tpu.data.eventslicer import EventSlicer
from bflow_tpu.data.io import h5_to_np_array, load_flow_png, np_array_to_h5
from bflow_tpu.data.keys import DataLoading as K, DataSetType
from bflow_tpu.data.loader import Loader
from bflow_tpu.data.representations import VoxelGrid, normalize_voxel_grid

from fixtures import encode_flow_png, make_dsec_sequence, make_multiflow_sample


# ---------------------------------------------------------------- voxel grid

def torch_voxel_oracle(ch, ht, wd, x, y, pol, t, t0, t1):
    """Reference scatter semantics via torch put_(accumulate=True)."""
    grid = torch.zeros(ch, ht, wd)
    t_norm = (
        torch.from_numpy(t.astype(np.float64)) - t0
    ) / (t1 - t0) * (ch - 1)
    t_floor = t_norm.floor().int()
    value = 2 * torch.from_numpy(pol.astype(np.float32)) - 1
    int_xy = np.issubdtype(x.dtype, np.integer)
    if int_xy:
        xl = torch.from_numpy(x.astype(np.int64))
        yl = torch.from_numpy(y.astype(np.int64))
        for tlim in (t_floor, t_floor + 1):
            mask = (tlim >= 0) & (tlim < ch)
            w = value * (1 - (tlim - t_norm).abs())
            idx = ht * wd * tlim.long() + wd * yl + xl
            grid.put_(idx[mask], w[mask].float(), accumulate=True)
    else:
        xf = torch.from_numpy(x.astype(np.float64))
        yf = torch.from_numpy(y.astype(np.float64))
        x0 = xf.floor().int()
        y0 = yf.floor().int()
        for xlim in (x0, x0 + 1):
            for ylim in (y0, y0 + 1):
                for tlim in (t_floor, t_floor + 1):
                    mask = (
                        (xlim < wd) & (xlim >= 0)
                        & (ylim < ht) & (ylim >= 0)
                        & (tlim >= 0) & (tlim < ch)
                    )
                    w = (
                        value
                        * (1 - (xlim - xf).abs())
                        * (1 - (ylim - yf).abs())
                        * (1 - (tlim - t_norm).abs())
                    )
                    idx = ht * wd * tlim.long() + wd * ylim.long() + xlim.long()
                    grid.put_(idx[mask], w[mask].float(), accumulate=True)
    return grid.numpy()


@pytest.mark.parametrize("int_xy", [True, False])
def test_voxel_grid_matches_torch_oracle(rng, int_xy):
    ch, ht, wd = 5, 16, 20
    n = 3000
    t = np.sort(rng.integers(0, 100000, n)).astype(np.int64)
    pol = rng.integers(0, 2, n).astype(np.float32)
    if int_xy:
        x = rng.integers(0, wd, n).astype(np.int64)
        y = rng.integers(0, ht, n).astype(np.int64)
    else:
        x = rng.uniform(-0.5, wd - 0.5, n).astype(np.float32)
        y = rng.uniform(-0.5, ht - 0.5, n).astype(np.float32)
    t0, t1 = 10000, 90000

    got = VoxelGrid(ch, ht, wd).convert(x, y, pol, t, t0, t1)
    want = torch_voxel_oracle(ch, ht, wd, x, y, pol, t, t0, t1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_normalize_voxel_grid(rng):
    g = rng.standard_normal((3, 8, 8)).astype(np.float32)
    g[g < 0.5] = 0.0
    out = normalize_voxel_grid(g.copy())
    nz = out[g != 0]
    assert abs(nz.mean()) < 1e-5
    assert abs(nz.std() - 1.0) < 1e-3
    assert np.all(out[g == 0] == 0)


# --------------------------------------------------------------- eventslicer

def test_event_slicer_window(tmp_path, rng):
    import h5py

    n = 20000
    t_rel = np.sort(rng.integers(0, 500_000, n)).astype(np.uint32)
    t_offset = 7_000_000
    total_ms = 600
    ms_to_idx = np.searchsorted(
        t_rel, np.arange(total_ms, dtype=np.int64) * 1000, side="left"
    )
    path = tmp_path / "ev.h5"
    with h5py.File(str(path), "w") as h5f:
        h5f.create_dataset("events/t", data=t_rel)
        for k in ("x", "y"):
            h5f.create_dataset(
                f"events/{k}", data=rng.integers(0, 100, n).astype(np.uint16)
            )
        h5f.create_dataset(
            "events/p", data=rng.integers(0, 2, n).astype(np.uint8)
        )
        h5f.create_dataset("ms_to_idx", data=ms_to_idx)
        h5f.create_dataset("t_offset", data=np.int64(t_offset))

    with h5py.File(str(path), "r") as h5f:
        slicer = EventSlicer(h5f)
        lo, hi = t_offset + 123_456, t_offset + 223_789
        ev = slicer.get_events(lo, hi)
        assert ev is not None
        assert np.all(ev["t"] >= lo) and np.all(ev["t"] < hi)
        # exact count vs brute force
        t_abs = t_rel.astype(np.int64) + t_offset
        want = np.sum((t_abs >= lo) & (t_abs < hi))
        assert ev["t"].size == want
        # window beyond the coarse index -> None
        assert slicer.get_events(
            t_offset + 700_000, t_offset + 800_000
        ) is None


# ------------------------------------------------------------------------ io

def test_voxel_cache_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((5, 12, 16)).astype(np.float32)
    path = tmp_path / "cache.h5"
    np_array_to_h5(arr, path)
    out = h5_to_np_array(path)
    np.testing.assert_array_equal(out, arr)

    bad = tmp_path / "corrupt.h5"
    bad.write_bytes(b"not an hdf5 file at all")
    assert h5_to_np_array(bad) is None
    assert h5_to_np_array(tmp_path / "missing.h5") is None


def test_flow_png_roundtrip(tmp_path, rng):
    flow = rng.uniform(-20, 20, (16, 24, 2)).astype(np.float32)
    valid = rng.random((16, 24)) > 0.3
    path = tmp_path / "flow.png"
    encode_flow_png(path, flow, valid)
    out_flow, out_valid = load_flow_png(path)
    np.testing.assert_array_equal(out_valid, valid)
    np.testing.assert_allclose(
        out_flow[valid], flow[valid], atol=1.0 / 128.0
    )
    assert np.all(out_flow[~valid] == 0)


# ------------------------------------------------------------- dsec provider

@pytest.fixture(scope="module")
def dsec_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsec") / "train"
    root.mkdir()
    make_dsec_sequence(root, "seq_a", n_flows=4, gap_after=2)
    make_dsec_sequence(root, "seq_b", n_flows=2, seed=7)
    return root.parent


def test_dsec_provider_end_to_end(dsec_root):
    from bflow_tpu.data.dsec.provider import DsecProvider
    from bflow_tpu.data.dsec.sequence import generate_sequence

    nbins = 5
    args = dict(
        num_bins=nbins,
        load_voxel_grid=True,
        extended_voxel_grid=True,
        normalize=True,
        merge_grids=True,
        data_augm=False,
        height=32,
        width=48,
    )
    seq = generate_sequence(dsec_root / "train" / "seq_a", args)
    # gap_after=2 splits into two contiguous subsequences
    assert len(seq.datasets) == 2
    assert len(seq) == 4

    item = seq[1]
    assert item[K.EV_REPR.value].shape == (32, 48, 2 * nbins - 1)
    assert item[K.FLOW.value].shape == (32, 48, 2)
    assert item[K.FLOW_VALID.value].shape == (32, 48)
    assert item[K.IMG.value].shape == (2, 32, 48, 3)
    assert item[K.DATASET_TYPE.value] == int(DataSetType.DSEC)

    # cache files were written and reused (bit-identical reload)
    cache_dir = (
        dsec_root / "train" / "seq_a" / "events" / "left"
        / f"voxel_grids_v1_100ms_forward_{nbins}_bins"
    )
    assert cache_dir.is_dir() and len(list(cache_dir.iterdir())) > 0
    item2 = seq[1]
    np.testing.assert_array_equal(
        item[K.EV_REPR.value], item2[K.EV_REPR.value]
    )


def test_dsec_first_window_synthesized(dsec_root):
    """Index 0 has no previous flow window: its t-1 grid is synthesized."""
    from bflow_tpu.data.dsec.sequence import generate_sequence

    args = dict(
        num_bins=5, load_voxel_grid=False, extended_voxel_grid=True,
        normalize=False, merge_grids=True, data_augm=False,
        height=32, width=48,
    )
    seq = generate_sequence(dsec_root / "train" / "seq_b", args)
    item = seq[0]
    assert np.isfinite(item[K.EV_REPR.value]).all()


def test_dsec_augmentation_crop(dsec_root):
    from bflow_tpu.data.dsec.sequence import generate_sequence

    args = dict(
        num_bins=5, load_voxel_grid=False, extended_voxel_grid=True,
        normalize=False, merge_grids=True, data_augm=True,
        height=32, width=48, crop_hw=(16, 24),
    )
    seq = generate_sequence(dsec_root / "train" / "seq_b", args)
    rng = np.random.default_rng(3)
    item = seq.datasets[0].get_item(0, rng)
    assert item[K.EV_REPR.value].shape == (16, 24, 9)
    assert item[K.FLOW.value].shape == (16, 24, 2)
    assert item[K.IMG.value].shape == (2, 16, 24, 3)


# -------------------------------------------------------- multiflow provider

@pytest.fixture(scope="module")
def multiflow_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mf")
    for split in ("train", "val"):
        d = root / split
        d.mkdir()
        make_multiflow_sample(d, "seq_0001", seed=1)
        make_multiflow_sample(d, "seq_0002", seed=2)
    return root


def test_multiflow_provider(multiflow_root):
    from bflow_tpu.data.multiflow2d.provider import MultiflowProvider

    provider = MultiflowProvider(
        {
            "path": str(multiflow_root),
            "load_voxel_grid": False,
            "normalize_voxel_grid": True,
            "extended_voxel_grid": True,
            "flow_every_n_ms": 100,
            "downsample": False,
            "photo_augm": False,
            "orig_hw": (32, 48),
            "crop_hw": (16, 24),
        },
        nbins_context=6,
    )
    assert provider.get_nbins_context() == 6
    assert provider.get_nbins_correlation() == 4

    val = provider.get_val_dataset()
    # val subset built without augmentation; patch crop-free access
    item = val.sample_list[0]
    grid = item.get_voxel_grid()
    assert grid.shape == (9, 32, 48)  # 6 + 4 - 1 bins

    out = val.get_item(0, np.random.default_rng(0))
    # flow every 100 ms from 400: 500..900 -> 5 timestamps, last at 1.0
    ts = out[K.FLOW_TIMESTAMPS.value]
    assert ts.shape == (5,)
    assert ts[-1] == 1.0
    np.testing.assert_allclose(np.diff(ts), 0.2, rtol=1e-5)
    assert out[K.FLOW.value].shape == (5, 32, 48, 2)
    assert out[K.IMG.value].shape == (2, 32, 48, 3)
    assert out[K.EV_REPR.value].shape == (32, 48, 9)


# ---------------------------------------------------------------------loader

def test_loader_batching_and_determinism(multiflow_root):
    from bflow_tpu.data.multiflow2d.datasubset import Datasubset

    ds = Datasubset(
        multiflow_root / "train",
        data_augm=True,
        num_bins_context=6,
        flow_every_n_ms=100,
        load_voxel_grid=False,
        normalize_voxel_grid_=False,
        orig_hw=(32, 48),
        crop_hw=(16, 24),
    )
    loader = Loader(ds, batch_size=2, shuffle=True, num_workers=2, seed=5)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b[K.EV_REPR.value].shape == (2, 16, 24, 9)
    assert b[K.IMG.value].shape == (2, 2, 16, 24, 3)  # (2 frames, N, ...)
    assert b[K.FLOW.value].shape == (5, 2, 16, 24, 2)  # (M ts, N, ...)

    # determinism: same seed+epoch -> identical batches
    again = list(Loader(ds, batch_size=2, shuffle=True, num_workers=4, seed=5))
    np.testing.assert_array_equal(
        b[K.EV_REPR.value], again[0][K.EV_REPR.value]
    )
    # different epoch -> different augmentation
    loader.set_epoch(1)
    other = list(loader)[0]
    assert not np.array_equal(b[K.FLOW.value], other[K.FLOW.value])


def test_dsec_test_split_loading(tmp_path, rng):
    """Test-split items: voxel grids + images, no GT flow."""
    import shutil

    from bflow_tpu.data.dsec.provider import DsecProvider

    root = tmp_path / "ds"
    (root / "train").mkdir(parents=True)
    (root / "test").mkdir()
    make_dsec_sequence(root / "train", "seq_tr", n_flows=2)
    # fabricate a test sequence: copy a train seq, drop the GT flow pngs
    make_dsec_sequence(root / "test", "seq_te", n_flows=3, seed=5)
    shutil.rmtree(root / "test" / "seq_te" / "flow" / "forward")

    provider = DsecProvider(
        {
            "path": str(root),
            "load_voxel_grid": False,
            "extended_voxel_grid": True,
            "normalize_voxel_grid": True,
            "height": 32,
            "width": 48,
        },
        nbins_context=5,
    )
    test_ds = provider.get_test_dataset()
    assert test_ds is not None and len(test_ds) == 3
    item = test_ds[1]
    assert item[K.EV_REPR.value].shape == (32, 48, 9)
    assert item[K.IMG.value].shape == (2, 32, 48, 3)
    assert K.FLOW.value not in item
    assert item[K.FILE_INDEX.value] == 2


def test_grain_loader(multiflow_root):
    """Grain pipeline yields the same batch structure as the threaded
    Loader, deterministically."""
    from bflow_tpu.data.grain_loader import make_grain_loader
    from bflow_tpu.data.multiflow2d.datasubset import Datasubset

    ds = Datasubset(
        multiflow_root / "train",
        data_augm=True,
        num_bins_context=6,
        flow_every_n_ms=100,
        load_voxel_grid=False,
        normalize_voxel_grid_=False,
        orig_hw=(32, 48),
        crop_hw=(16, 24),
    )
    loader = make_grain_loader(
        ds, batch_size=2, shuffle=True, num_workers=0, seed=11,
        shard_by_process=False,
    )
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b[K.EV_REPR.value].shape == (2, 16, 24, 9)
    assert b[K.IMG.value].shape == (2, 2, 16, 24, 3)
    assert b[K.FLOW.value].shape == (5, 2, 16, 24, 2)

    again = list(make_grain_loader(
        ds, batch_size=2, shuffle=True, num_workers=0, seed=11,
        shard_by_process=False,
    ))[0]
    np.testing.assert_array_equal(
        b[K.EV_REPR.value], again[K.EV_REPR.value]
    )


def test_blosc_memcpy_chunk_decode(rng):
    """c-blosc memcpy fallback chunks store the ORIGINAL buffer; the
    shuffle flag must be ignored on decode."""
    import struct

    from bflow_tpu.data import blosc_native as bn

    if not bn.available():
        pytest.skip("native codec unavailable")
    arr = rng.standard_normal(64).astype(np.float32)
    raw = arr.tobytes()
    # header: ver, verlz, flags=(shuffle|memcpy)=0x3, typesize=4,
    # nbytes, blocksize, cbytes
    hdr = bytes([2, 1, 0x3, 4]) + struct.pack(
        "<III", len(raw), len(raw), 16 + len(raw)
    )
    out = bn.decompress(hdr + raw, len(raw))
    assert out is not None
    np.testing.assert_array_equal(np.frombuffer(out, np.float32), arr)


def test_flow_augmentor_flip_semantics(rng):
    """Flips negate the matching flow component (reference augmentor.py
    contract); crop is shared across all tensors."""
    from bflow_tpu.data.augmentor import FlowAugmentor

    ev = rng.standard_normal((9, 20, 30)).astype(np.float32)
    flow = rng.standard_normal((2, 20, 30)).astype(np.float32)
    valid = rng.random((20, 30)) > 0.5
    img = rng.integers(0, 255, (3, 20, 30)).astype(np.uint8)

    aug = FlowAugmentor((10, 12), h_flip_prob=1.0, v_flip_prob=0.0)
    rng2 = np.random.default_rng(0)
    evs, flows, valids, imgs = aug(rng2, [ev], [flow], [valid], [img])

    # shapes cropped consistently
    assert evs[0].shape == (9, 10, 12)
    assert flows[0].shape == (2, 10, 12)
    assert valids[0].shape == (10, 12)
    assert imgs[0].shape == (3, 10, 12)

    # reconstruct expected: h-flip (axis -1) + x-sign negation, then crop
    f = np.flip(flow, -1).copy()
    f[0] *= -1
    # crop offset is rng-dependent; verify sign/flip on the full-frame
    # tensors by re-running with a crop equal to the full size - 1
    aug_full = FlowAugmentor((19, 29), h_flip_prob=1.0, v_flip_prob=0.0)
    rng3 = np.random.default_rng(0)
    _, flows_f, _, _ = aug_full(rng3, [ev], [flow], [valid], [img])
    y0 = x0 = None
    # locate the crop by matching against the expected flipped tensor
    for yy in range(2):
        for xx in range(2):
            if np.allclose(flows_f[0], f[:, yy:yy+19, xx:xx+29]):
                y0, x0 = yy, xx
    assert y0 is not None, "flipped+sign-negated flow not found in output"


def test_loader_propagates_worker_errors():
    from bflow_tpu.data.loader import Loader

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = Loader(Broken(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)
