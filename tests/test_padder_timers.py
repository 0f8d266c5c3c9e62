"""InputPadder + timers + CSV logger unit tests."""

import numpy as np

from bflow_tpu.utils.padder import InputPadder


def test_padder_roundtrip(rng):
    import jax.numpy as jnp

    p = InputPadder(min_size=8)
    assert not p.requires_padding(480, 640)
    assert p.requires_padding(481, 640)
    assert p.requires_padding(480, 641)

    x = jnp.asarray(rng.standard_normal((2, 37, 53, 3)), jnp.float32)
    xp = p.pad(x)
    assert xp.shape[1] % 8 == 0 and xp.shape[2] % 8 == 0
    back = p.unpad(xp, 37, 53)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    # replicate semantics: padded border equals edge values
    rows, cols = p._pads(37, 53)
    if rows[0] > 0:
        np.testing.assert_array_equal(
            np.asarray(xp[:, 0]), np.asarray(xp[:, rows[0]])
        )

    pk = InputPadder(min_size=8, no_top_padding=True)
    xk = pk.pad(x)
    np.testing.assert_array_equal(  # top row untouched in KITTI mode
        np.asarray(xk[:, 0, pk._pads(37, 53)[1][0] : pk._pads(37, 53)[1][0] + 53]),
        np.asarray(x[:, 0]),
    )


def test_timers_registry(capsys):
    from bflow_tpu.utils import timers

    timers.timers.clear()
    with timers.Timer(timer_name="unit_test_block"):
        pass
    assert len(timers.timers["unit_test_block"]) == 1
    with timers.TimerDummy(timer_name="noop"):
        pass
    timers.print_timing_info(warmup_iters=0)
    out = capsys.readouterr().out
    assert "unit_test_block" in out


def test_csv_logger_evolving_fields(tmp_path):
    from bflow_tpu.loggers.csv_logger import CSVLogger

    lg = CSVLogger(str(tmp_path), "m")
    lg.log({"a": 1.0}, step=1)
    lg.log({"a": 2.0, "b": 3.0}, step=2)  # new column appears
    lg.finalize()
    text = (tmp_path / "m.csv").read_text()
    assert "a" in text and "b" in text and "step" in text
    lines = [l for l in text.strip().splitlines() if l]
    assert len(lines) == 3  # header + 2 rows


def test_flow_colorwheel_properties(rng):
    from bflow_tpu.callbacks.flow_vis import flow_to_color, make_colorwheel

    wheel = make_colorwheel()
    assert wheel.shape == (55, 3)
    assert wheel.min() >= 0 and wheel.max() <= 255

    flow = rng.standard_normal((16, 16, 2)).astype(np.float32) * 5
    img = flow_to_color(flow)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # zero flow renders near-white (center of the wheel)
    img0 = flow_to_color(np.zeros((4, 4, 2), np.float32), rad_max=1.0)
    assert img0.min() > 230


def test_visualization_renderers(rng):
    from bflow_tpu.callbacks.visualization import (
        bezier_trajectory_figure,
        figure_to_array,
        render_error_map,
        render_event_representation,
        summary_image,
    )

    ev = rng.standard_normal((24, 32)).astype(np.float32)
    img = render_event_representation(ev)
    assert img.shape == (24, 32, 3) and img.dtype == np.uint8

    pred = rng.standard_normal((24, 32, 2)).astype(np.float32)
    gt = rng.standard_normal((24, 32, 2)).astype(np.float32)
    err = render_error_map(pred, gt, clip=3.0)
    assert err.shape == (24, 32, 3)

    strip = summary_image(pred, gt, None, ev, None)
    assert strip.shape == (24, 4 * 32, 3)

    fig = bezier_trajectory_figure(
        rng.standard_normal((24, 32, 2, 2)).astype(np.float32), n_points=2
    )
    arr = figure_to_array(fig)
    assert arr.ndim == 3 and arr.shape[-1] == 3


def test_wandb_logger_noop_without_wandb():
    from bflow_tpu.loggers.wandb_logger import WandbLogger

    wb = WandbLogger(project="p", group="g")
    assert not wb.enabled  # wandb absent in this environment
    wb.log({"a": 1.0}, step=1)  # all no-ops, no raise
    wb.log_image("k", np.zeros((4, 4, 3), np.uint8), step=1)
    wb.upload_checkpoint("/tmp/nowhere", step=1)
    assert wb.run_id is None
    wb.finalize()


def test_distributed_helpers_single_process():
    import jax

    from bflow_tpu.parallel.distributed import (
        host_local_batch_slice,
        initialize_distributed,
        is_primary_host,
    )

    assert initialize_distributed() is False  # single-process: no-op
    assert is_primary_host()
    sl = host_local_batch_slice(8)
    assert (sl.start, sl.stop) == (0, 8)
