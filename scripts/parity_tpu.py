"""End-to-end numerical parity vs the reference torch model ON THE TPU.

tests/test_reference_parity.py proves parity with both nets on CPU;
this script runs OUR side on the real chip (f32 parity mode, pallas
lookup) against the torch reference on CPU, quantifying the full
hardware-backend drift (conv/matmul HIGHEST passes, pallas kernels,
reduction orders). ARCHITECTURE.md documents ~7e-5 single-iteration
backend drift; the gate here is 1e-3 at 2 iterations (the untrained
recurrence amplifies ~x10 per iteration).

Usage: python scripts/parity_tpu.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    from tests.test_reference_parity import (
        _jax_forward,
        _make_cfg,
        _make_inputs,
        _model_params,
        _rel_err,
        _torch_forward,
    )

    assert jax.default_backend() != "cpu", (
        "this script measures the TPU backend; run without JAX_PLATFORMS"
    )

    from tests.test_reference_parity import CONFIGS

    ok = True
    for name in CONFIGS:
        cfg = _make_cfg(name)
        # production lookup path on the chip (auto -> pallas), not the
        # gather oracle the CPU tests pin
        cfg = cfg.__class__(
            **{**cfg.__dict__, "lookup_method": "auto"}
        )
        voxel, images = _make_inputs(cfg)
        low_t, up_t, sd = _torch_forward(cfg, voxel, images, iters=2)
        low_j, up_j = _jax_forward(cfg, sd, voxel, images, iters=2)
        e_low = _rel_err(low_j, low_t)
        e_up = _rel_err(up_j, up_t)
        print(
            f"{name:20s} 2-iter parity vs torch: low rel={e_low:.2e} "
            f"up rel={e_up:.2e}"
        )
        ok &= e_low < 1e-3 and e_up < 1e-3
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
