"""Timing + profiling harness.

The reference's observability is ad-hoc ``Instant`` timers inside ignored
benchmark tests (``src/cuda.rs:547-614``) and RTF accounting in its eval
example. Here it is a small first-class utility:

- ``Timer``: wall-clock context manager; call ``t.block_on(result)`` on
  the device output to synchronize — JAX dispatch is async, so the bare
  exit time measures submission, not compute;
- ``benchmark(fn, *args)``: warmup + timed iterations -> per-call seconds;
- ``rtfx(audio_seconds, wall_seconds)``: the realtime factor the whole
  framework reports;
- ``trace(path)``: jax.profiler trace context for TPU timeline capture
  (view in TensorBoard / Perfetto).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax


class Timer:
    """``with Timer() as t: y = f(x); t.block_on(y)`` -> ``t.seconds``.

    The context exit alone records WALL time of the Python block — JAX
    dispatch is asynchronous, so for device work you must pass the result
    through ``block_on`` (which waits and re-stamps ``seconds``). Through
    a remote runtime even ``block_until_ready`` can be optimistic; fetch
    a value (``float``/``np.asarray``) when the number really matters."""

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.seconds = time.perf_counter() - self._start

    def block_on(self, value: Any) -> Any:
        jax.block_until_ready(value)
        self.seconds = time.perf_counter() - self._start
        return value


def benchmark(
    fn: Callable, *args, iters: int = 10, warmup: int = 2
) -> float:
    """Mean wall seconds per call after warmup (device-synchronized)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def rtfx(audio_seconds: float, wall_seconds: float) -> float:
    """Realtime factor: seconds of audio processed per wall second."""
    return audio_seconds / wall_seconds if wall_seconds else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile: ``with trace('/tmp/trace'): run()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
