"""Named-timer registry with an atexit summary (reference parity:
/root/reference/utils/timers.py). `DeviceTimer` brackets the timed block
with `jax.block_until_ready` on given arrays — the JAX analogue of the
reference's cuda-synchronized timer; `TimerDummy` compiles instrumentation
out the same way the reference's model imports the dummy class.
"""

from __future__ import annotations

import atexit
import time
from collections import defaultdict
from typing import Dict, List, Optional

cuda_timers: Dict[str, List[float]] = defaultdict(list)
timers: Dict[str, List[float]] = defaultdict(list)


class DeviceTimer:
    """Wall time of a block, synchronized on device completion."""

    def __init__(self, outputs_getter=None, timer_name: str = ""):
        assert timer_name
        self.name = timer_name
        self.outputs_getter = outputs_getter
        self.start: Optional[float] = None

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *args):
        import jax

        if self.outputs_getter is not None:
            jax.block_until_ready(self.outputs_getter())
        cuda_timers[self.name].append(time.time() - self.start)


class Timer:
    def __init__(self, timer_name: str = ""):
        assert timer_name
        self.name = timer_name
        self.start: Optional[float] = None

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *args):
        timers[self.name].append(time.time() - self.start)


class TimerDummy:
    """No-op stand-in: swap the import to compile timing out entirely."""

    def __init__(self, *args, **kwargs):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *args):
        pass


def print_timing_info(warmup_iters: int = 2) -> None:
    print("== Timing statistics ==")
    for name, values in {**cuda_timers, **timers}.items():
        vals = values[warmup_iters:] if len(values) > warmup_iters else values
        if not vals:
            continue
        mean_ms = 1000.0 * sum(vals) / len(vals)
        print(f"{name}: mean {mean_ms:.2f} ms over {len(vals)} samples")


atexit.register(print_timing_info)
