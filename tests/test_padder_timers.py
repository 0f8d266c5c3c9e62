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
