#!/usr/bin/env python
"""Cross-thread throughput benchmark for the native SPSC sample ring —
the analogue of the reference's ``examples/browser/bench_rw.js`` (SAB ring
throughput across worker_threads).

    python tools/bench_ring.py
"""

from __future__ import annotations

import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from melspec_tpu.runtime.ringbuffer import SampleRing, native_available


def run(total_samples: int = 20_000_000, chunk: int = 4096,
        capacity: int = 1 << 18, force_python: bool = False) -> float:
    ring = SampleRing(capacity, force_python=force_python)
    data = np.arange(chunk, dtype=np.float32)
    received = [0]

    def producer():
        sent = 0
        while sent < total_samples:
            remaining = data[: min(chunk, total_samples - sent)]
            while remaining.size:
                n = ring.push(remaining)
                remaining = remaining[n:]
            sent += min(chunk, total_samples - sent)

    def consumer():
        got = 0
        while got < total_samples:
            out = ring.pop(chunk * 2)
            got += out.size
        received[0] = got

    t_prod = threading.Thread(target=producer)
    t_cons = threading.Thread(target=consumer)
    start = time.perf_counter()
    t_prod.start(); t_cons.start()
    t_prod.join(); t_cons.join()
    wall = time.perf_counter() - start
    assert received[0] == total_samples
    return total_samples / wall


def main() -> None:
    if native_available():
        rate = run(force_python=False)
        print(f"native ring:  {rate/1e6:.1f} M samples/s "
              f"({rate*4/1e9:.2f} GB/s, {rate/16000:,.0f} audio streams "
              f"at 16 kHz)")
    rate = run(total_samples=2_000_000, force_python=True)
    print(f"python ring:  {rate/1e6:.2f} M samples/s")


if __name__ == "__main__":
    main()
