"""Profiling & timing utilities (SURVEY §5 tracing/profiling: the
reference relied on unused GNU Radio perf counters; here tracing is
first-class).

* `trace_to(dir)`: context manager around `jax.profiler` — produces a
  TensorBoard-loadable device trace of the pipeline.
* `Timer`: wall-clock timing with a FETCH-based completion fence. On
  remote/async TPU backends `block_until_ready` can return at enqueue
  time (observed on tunneled devices), so the only trustworthy fence is a
  device→host roundtrip of a small output; `Timer.fence(x)` does that.
* `throughput_report`: snapshots/s + samples/s from timed runs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np
import jax


@contextlib.contextmanager
def trace_to(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    def __init__(self):
        self.laps = []
        self._t0 = None

    @staticmethod
    def fence(x) -> None:
        """Guaranteed completion fence: fetch a small leaf to host."""
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jax.device_get(leaf))

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.laps.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        return float(np.mean(self.laps)) if self.laps else float("nan")

    @property
    def best(self) -> float:
        return float(np.min(self.laps)) if self.laps else float("nan")


def throughput_report(seconds_per_call: float, snapshots_per_call: int,
                      snapshot_size: int, num_channels: int,
                      samp_rate: Optional[float] = None,
                      hop: Optional[int] = None) -> dict:
    """samples/s counts each INPUT sample once: with overlapped windows a
    snapshot advances the stream by `hop` samples (hop = S − overlap), not
    by snapshot_size — pass `hop` for overlapped configs or samples/s,
    ingest bytes/s and x_realtime over-count by S/hop."""
    snaps_s = snapshots_per_call / seconds_per_call
    samples_s = snaps_s * (hop if hop is not None else snapshot_size)
    rep = {
        "snapshots_per_s": snaps_s,
        "samples_per_s_per_channel": samples_s,
        "aggregate_samples_per_s": samples_s * num_channels,
        "ingest_bytes_per_s": samples_s * num_channels * 8.0,
    }
    if samp_rate:
        rep["x_realtime"] = samples_s / samp_rate
    return rep
