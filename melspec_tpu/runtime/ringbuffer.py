"""ctypes binding for the native SPSC sample ring, with a pure-Python
fallback when no C++ toolchain is available.

The native library is compiled on first use (``make`` in
``runtime/native/``) and cached next to the source. API mirrors the
capacity-bounded queue the reference's streaming layer sits on
(``src/rb.rs:12-84``): push (drop-newest), push_overwrite (overwrite-oldest
with dropped accounting, like the browser SAB ring), pop.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "libmelspec_rb.so"
_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            src = _NATIVE_DIR / "ringbuffer.cpp"
            # a distribution may ship only the prebuilt .so: a missing
            # source file must not poison the load when the library exists
            stale = (
                not _LIB_PATH.exists()
                or (src.exists()
                    and _LIB_PATH.stat().st_mtime < src.stat().st_mtime)
            )
            if stale:
                subprocess.run(
                    ["make", "-sB"], cwd=_NATIVE_DIR, check=True,
                    capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            # symbol binding stays inside the try: a prebuilt .so from an
            # older revision (no source shipped, so no rebuild possible)
            # may lack newer entry points — fall back to Python, don't
            # crash every SampleRing() with AttributeError
            lib.msrb_create.restype = ctypes.c_void_p
            lib.msrb_create.argtypes = [ctypes.c_uint64]
            lib.msrb_destroy.argtypes = [ctypes.c_void_p]
            for name in ("msrb_capacity", "msrb_len", "msrb_dropped"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_uint64
                fn.argtypes = [ctypes.c_void_p]
            for name in ("msrb_push", "msrb_push_overwrite", "msrb_pop",
                         "msrb_pop_exact"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_uint64
                fn.argtypes = [
                    ctypes.c_void_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_uint64,
                ]
            lib.msrb_pop_many.restype = ctypes.c_uint64
            lib.msrb_pop_many.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_uint64,
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
            ]
        except (OSError, subprocess.SubprocessError, AttributeError):
            _lib_failed = True
            return None

        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_library() is not None


class SampleRing:
    """Bounded f32 sample queue. Thread-safe for one producer + one
    consumer when backed by the native library."""

    def __init__(self, capacity: int, force_python: bool = False):
        self._lib = None if force_python else _load_library()
        if self._lib is not None:
            self._handle = self._lib.msrb_create(capacity)
            if not self._handle:
                raise MemoryError("failed to allocate native ring")
            self._capacity = int(self._lib.msrb_capacity(self._handle))
        else:
            from collections import deque

            self._capacity = max(2, 1 << (capacity - 1).bit_length())
            self._deque: "deque[float]" = deque()
            self._py_lock = threading.Lock()
            self._py_dropped = 0

    # -- properties ---------------------------------------------------------

    @property
    def capacity(self) -> int:
        return self._capacity

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.msrb_len(self._handle))
        with self._py_lock:
            return len(self._deque)

    @property
    def dropped(self) -> int:
        if self._lib is not None:
            return int(self._lib.msrb_dropped(self._handle))
        with self._py_lock:
            return self._py_dropped

    # -- producer -----------------------------------------------------------

    def push(self, samples: np.ndarray) -> int:
        """Append samples, rejecting the excess when full; returns the
        number accepted (the caller may retry the rest)."""
        samples = np.ascontiguousarray(samples, dtype=np.float32)
        if self._lib is not None:
            ptr = samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            return int(self._lib.msrb_push(self._handle, ptr, samples.size))
        with self._py_lock:
            free = self._capacity - len(self._deque)
            take = min(free, samples.size)
            self._deque.extend(samples[:take].tolist())
            return take

    def push_overwrite(self, samples: np.ndarray) -> int:
        """Append samples, overwriting the oldest when full; returns the
        number of samples dropped."""
        samples = np.ascontiguousarray(samples, dtype=np.float32)
        if self._lib is not None:
            ptr = samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            return int(
                self._lib.msrb_push_overwrite(self._handle, ptr, samples.size)
            )
        with self._py_lock:
            dropped = 0
            overflow = len(self._deque) + samples.size - self._capacity
            if overflow > 0:
                for _ in range(min(overflow, len(self._deque))):
                    self._deque.popleft()
                    dropped += 1
            if samples.size > self._capacity:
                dropped += samples.size - self._capacity
                samples = samples[-self._capacity :]
            self._deque.extend(samples.tolist())
            self._py_dropped += dropped
            return dropped

    # -- consumer -----------------------------------------------------------

    def pop(self, n: int) -> np.ndarray:
        """Read up to ``n`` samples; returns what was available."""
        if self._lib is not None:
            out = np.empty(n, dtype=np.float32)
            ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            got = int(self._lib.msrb_pop(self._handle, ptr, n))
            return out[:got]
        with self._py_lock:
            take = min(n, len(self._deque))
            return np.asarray(
                [self._deque.popleft() for _ in range(take)], dtype=np.float32
            )

    def pop_exact(self, out: np.ndarray) -> bool:
        """Pop exactly ``out.size`` samples into ``out`` (f32 contiguous),
        or nothing — the all-or-nothing drain a fixed-hop tick wants.
        Returns whether the pop happened."""
        assert out.dtype == np.float32 and out.flags.c_contiguous
        if self._lib is not None:
            ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            return bool(self._lib.msrb_pop_exact(self._handle, ptr,
                                                 out.size))
        with self._py_lock:
            if len(self._deque) < out.size:
                return False
            out[:] = [self._deque.popleft() for _ in range(out.size)]
            return True

    def __del__(self):
        lib = getattr(self, "_lib", None)
        handle = getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.msrb_destroy(handle)


def pop_many(rings: "list[Optional[SampleRing]]", need: int,
             out: np.ndarray) -> np.ndarray:
    """Batched all-or-nothing drain across a fleet: for each non-None
    ``rings[j]`` pop exactly ``need`` samples into ``out[j]`` (row left
    untouched otherwise). Returns ``ok [n] bool``.

    One FFI call per tick instead of one per stream when every ring is
    native; mixed/None/Python rings fall back per-entry. ``out`` must be
    C-contiguous f32 ``[len(rings), need]``.
    """
    n = len(rings)
    assert out.dtype == np.float32 and out.flags.c_contiguous
    assert out.shape == (n, need)
    lib = _load_library()
    if lib is not None and all(
        r is None or r._lib is not None for r in rings
    ):
        handles = (ctypes.c_void_p * n)(
            *[r._handle if r is not None else None for r in rings]
        )
        ok = np.zeros(n, dtype=np.uint8)
        lib.msrb_pop_many(
            handles, n, need,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return ok.astype(bool)
    ok = np.zeros(n, dtype=bool)
    for j, r in enumerate(rings):
        if r is not None:
            ok[j] = r.pop_exact(out[j])
    return ok
