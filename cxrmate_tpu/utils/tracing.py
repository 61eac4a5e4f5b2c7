"""Profiling and trace annotation helpers.

The reference has no tracing (SURVEY §5). Here the hot phases carry names that
show up in profiler dumps: the compiled phases (encode / prefill / decode_step /
train_step) are tagged with ``jax.named_scope`` at their definitions
(models/encoder_decoder.py, generate/decode.py, generate/beam.py,
train/tf_trainer.py), and the host-side loops in cli/stages.py wrap device calls
in :func:`annotate`. ``bench.py --profile`` wraps the timed loop in
:func:`profile` to dump a perfetto/tensorboard trace."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


def annotate(name: str):
    """Trace annotation usable as decorator or context manager."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile(log_dir: str = "/tmp/cxrmate_trace", enabled: bool = True) -> Iterator[None]:
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Wall-clock step timing with device fencing via a host transfer (on some
    experimental backends ``block_until_ready`` does not synchronise)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, fence_value=None):
        t0 = time.perf_counter()
        yield
        if fence_value is not None:
            import numpy as np

            np.asarray(fence_value)
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        import numpy as np

        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "min_s": float(arr.min()),
        }
