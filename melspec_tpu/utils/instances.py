"""Config-keyed sharing of streaming frontend instances.

The streaming classes (``MultiStreamFrontend``, ``MultiStreamMel``,
``StreamingMel``, ``SourceRateFrontend``, ...) jit their step methods
with ``static_argnums=0``: JAX's compilation cache keys each executable
by the INSTANCE, and the cache holds that key strongly, so every
construction of an otherwise-identical frontend adds (and retains, until
process exit) a fresh executable plus its baked matrix constants. That
is the right trade for the intended shape — a handful of long-lived
frontends per process — but a deployment that constructs one frontend
per client, per reconnect, or per distinct source rate would leak
compiles (see ``docs/ROADMAP.md`` item 10).

``shared_instance`` is the supported pattern for such callers: it
returns ONE canonical instance per ``(class, constructor args)`` key, so
equal-config constructions reuse both the instance and every executable
already compiled for it. Sharing is safe because the streaming classes
are functionally stateless — all per-stream state lives in the carried
pytree (``FrontendState`` etc.), never on the instance — so concurrent
sessions can run through one shared frontend with independent states.

All constructor arguments must be hashable; the frozen config
dataclasses (``MelConfig``, ``DetectionSettings``), dtypes, strings and
ints all are. The cache is unbounded by design: it holds at most one
instance per distinct configuration, which is exactly the set a
non-shared deployment would have to keep alive anyway.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Type, TypeVar

T = TypeVar("T")

_lock = threading.Lock()
_cache: dict = {}


def _freeze(value: Any) -> Any:
    """Map common unhashable argument shapes onto hashable keys.

    Container keys are tagged with their type so e.g. ``[160]``,
    ``(160,)`` and ``{160: ...}``-shaped arguments can never collide onto
    one cache entry."""
    if isinstance(value, dict):
        return ("dict",
                tuple(sorted((k, _freeze(v)) for k, v in value.items())))
    if isinstance(value, list):
        return ("list", tuple(_freeze(v) for v in value))
    if isinstance(value, tuple):
        return ("tuple", tuple(_freeze(v) for v in value))
    hash(value)  # raise TypeError early, with the offending value visible
    return value


def shared_instance(cls: Callable[..., T], *args: Any, **kwargs: Any) -> T:
    """Return the canonical ``cls(*args, **kwargs)`` for this process.

    The first call with a given ``(cls, args, kwargs)`` key constructs
    the instance; later equal calls return the SAME object, so its
    jit-compiled step methods (keyed by instance) are reused instead of
    recompiled. Keys compare by equality: two ``MelConfig`` values with
    the same fields are one key.

    Only share classes whose per-stream state is carried (passed in and
    returned), never stored on the instance — true for every streaming
    class in this package. Constructor arguments must be hashable (or a
    dict/list/tuple of hashables).
    """
    key = (cls, _freeze(args), _freeze(tuple(sorted(kwargs.items()))))
    with _lock:
        inst = _cache.get(key)
    if inst is not None:
        return inst
    # construct OUTSIDE the lock: frontend construction can take seconds
    # against a remote backend, must not serialize unrelated keys, and a
    # constructor that itself calls shared_instance must not deadlock.
    # Two racing constructions of the same key are harmless (the classes
    # are functionally stateless); the first store wins and stays
    # canonical.
    inst = cls(*args, **kwargs)
    with _lock:
        return _cache.setdefault(key, inst)


def shared_instance_count() -> int:
    """Number of distinct shared instances held (for tests/monitoring)."""
    with _lock:
        return len(_cache)


def clear_shared_instances() -> None:
    """Drop the canonical-instance table (tests only: JAX's own jit cache
    still retains executables for instances that were handed out)."""
    with _lock:
        _cache.clear()
