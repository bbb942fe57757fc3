"""Native SPSC ring: FIFO, wrap-around, dropped accounting, cross-thread
throughput — the test coverage the reference gives its JS SAB ring
(``examples/browser/test/ringbuffer.js``) and rtrb usage, for the C++ ring."""

import threading

import numpy as np
import pytest

from melspec_tpu.runtime.ringbuffer import SampleRing, native_available


@pytest.fixture(params=["native", "python"])
def ring_cls(request):
    if request.param == "native" and not native_available():
        pytest.skip("native ring unavailable (no C++ toolchain)")
    force_python = request.param == "python"
    return lambda cap: SampleRing(cap, force_python=force_python)


def test_fifo_order(ring_cls):
    ring = ring_cls(64)
    ring.push(np.arange(10, dtype=np.float32))
    out = ring.pop(10)
    np.testing.assert_array_equal(out, np.arange(10, dtype=np.float32))


def test_pop_empty(ring_cls):
    ring = ring_cls(16)
    assert ring.pop(4).size == 0


def test_wrap_around(ring_cls):
    ring = ring_cls(16)  # rounds to 16
    for rep in range(10):
        data = np.arange(rep * 7, rep * 7 + 7, dtype=np.float32)
        assert ring.push(data) == 7
        np.testing.assert_array_equal(ring.pop(7), data)


def test_push_rejects_when_full(ring_cls):
    ring = ring_cls(8)
    accepted = ring.push(np.arange(12, dtype=np.float32))
    assert accepted == ring.capacity
    assert ring.dropped == 0  # rejected, not destroyed
    np.testing.assert_array_equal(
        ring.pop(8), np.arange(ring.capacity, dtype=np.float32)
    )


def test_push_overwrite_oldest(ring_cls):
    ring = ring_cls(8)
    ring.push(np.arange(8, dtype=np.float32))
    dropped = ring.push_overwrite(np.array([100.0, 101.0], dtype=np.float32))
    assert dropped == 2
    out = ring.pop(8)
    np.testing.assert_array_equal(
        out, np.array([2, 3, 4, 5, 6, 7, 100, 101], dtype=np.float32)
    )


def test_overwrite_larger_than_capacity(ring_cls):
    ring = ring_cls(8)
    data = np.arange(20, dtype=np.float32)
    dropped = ring.push_overwrite(data)
    assert dropped == 12
    np.testing.assert_array_equal(ring.pop(8), data[-8:])


def test_len_and_capacity(ring_cls):
    ring = ring_cls(100)  # rounds to 128
    assert ring.capacity == 128
    ring.push(np.zeros(30, dtype=np.float32))
    assert len(ring) == 30
    ring.pop(10)
    assert len(ring) == 20


@pytest.mark.skipif(not native_available(), reason="needs native ring")
def test_concurrent_producer_consumer():
    """One producer thread + one consumer thread, every sample accounted
    for, order preserved (the reference benches this cross-thread via
    worker_threads — ``examples/browser/bench_rw.js``)."""
    ring = SampleRing(1 << 12)
    total = 200_000
    received = []

    def producer():
        sent = 0
        while sent < total:
            chunk = np.arange(sent, min(sent + 128, total), dtype=np.float32)
            pushed = ring.push(chunk)
            sent += pushed
            if pushed < chunk.size:
                pass  # ring full; retry remaining

    def consumer():
        got = 0
        while got < total:
            out = ring.pop(256)
            if out.size:
                received.append(out)
                got += out.size

    t1 = threading.Thread(target=producer)
    t2 = threading.Thread(target=consumer)
    t1.start(); t2.start()
    t1.join(timeout=30); t2.join(timeout=30)
    assert not t1.is_alive() and not t2.is_alive()
    stream = np.concatenate(received)
    assert stream.size == total
    np.testing.assert_array_equal(stream, np.arange(total, dtype=np.float32))


def test_pop_exact_all_or_nothing(ring_cls):
    r = ring_cls(64)
    r.push(np.arange(10, dtype=np.float32))
    out = np.zeros(16, dtype=np.float32)
    assert not r.pop_exact(out)          # 10 < 16: nothing consumed
    assert len(r) == 10
    out8 = np.zeros(8, dtype=np.float32)
    assert r.pop_exact(out8)
    np.testing.assert_array_equal(out8, np.arange(8, dtype=np.float32))
    assert len(r) == 2


def test_pop_many_batched_drain(ring_cls):
    """One call drains every ready ring into its row; short rings and
    None slots leave their rows untouched."""
    from melspec_tpu.runtime.ringbuffer import pop_many

    need = 12
    rings = [ring_cls(64), None, ring_cls(64), ring_cls(64)]
    rings[0].push(np.arange(need, dtype=np.float32))
    rings[2].push(np.arange(5, dtype=np.float32))          # too short
    rings[3].push(np.arange(100, 100 + need + 3, dtype=np.float32))
    out = np.full((4, need), -1.0, dtype=np.float32)
    ok = pop_many(rings, need, out)
    assert ok.tolist() == [True, False, False, True]
    np.testing.assert_array_equal(out[0], np.arange(need, dtype=np.float32))
    np.testing.assert_array_equal(out[1], -np.ones(need, np.float32))
    np.testing.assert_array_equal(out[2], -np.ones(need, np.float32))
    np.testing.assert_array_equal(
        out[3], np.arange(100, 100 + need, dtype=np.float32))
    assert len(rings[2]) == 5 and len(rings[3]) == 3


def test_pop_many_mixed_backends():
    """A fleet mixing native and pure-Python rings takes the per-entry
    fallback and still drains correctly."""
    from melspec_tpu.runtime.ringbuffer import native_available, pop_many

    if not native_available():
        import pytest

        pytest.skip("no native library on this host")
    need = 6
    rings = [SampleRing(32), SampleRing(32, force_python=True)]
    for r in rings:
        r.push(np.arange(need, dtype=np.float32))
    out = np.zeros((2, need), dtype=np.float32)
    ok = pop_many(rings, need, out)
    assert ok.all()
    np.testing.assert_array_equal(out[0], out[1])
