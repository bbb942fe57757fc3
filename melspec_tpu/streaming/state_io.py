"""Checkpoint/resume for serving-fleet device state.

The reference's checkpoint/resume story is feature-level: persist mel
frames as TGA and resume ASR from the file alone (SURVEY.md §5;
``examples/tga_whisper``). ``streaming/stft.py`` already mirrors that for
a single stream (``save_state``/``load_state``). At serving scale the
state worth persisting is the whole fleet's carried pytree — hop buffers,
warm-up counters, VAD frame history, resampler tails for ``S`` streams —
so a process restart (deploy, preemption, migration) can resume every
live stream mid-utterance instead of losing each stream's last window
and VAD context.

Every fleet state in this package is a nested ``NamedTuple`` of arrays,
so checkpointing is structurally trivial; what this module adds is the
part that prevents silent corruption on resume:

- the saved file records the pytree STRUCTURE (treedef string) and each
  leaf's shape + dtype, all validated against a template state from the
  target object's ``init()`` — loading a 16-stream checkpoint into a
  256-stream frontend, or a plain frontend's state into a source-rate
  one, fails loudly;
- a caller-supplied ``meta`` mapping (the frontends pass their config
  fingerprint: hop, fft, mel count, rates, VAD settings…) is stored and
  compared on load — same shapes with a different hop size would resume
  on the wrong frame grid, which no shape check can catch.

Use via the convenience methods (``MultiStreamFrontend.save_state`` /
``.load_state``, same on ``SourceRateFrontend``) or directly::

    save_stream_state(path, state, meta=front.state_meta())
    state = load_stream_state(path, like=front.init(),
                              meta=front.state_meta())

Scale-out: saving GATHERS a mesh-sharded state (``np.asarray`` on each
leaf); to resume on a mesh, re-apply the shardings derived from a live
state (test-enforced in ``tests/test_configs_broad.py``)::

    shardings = jax.tree_util.tree_map(lambda a: a.sharding, state)
    state = jax.device_put(front.load_state(path), shardings)
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping, Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["save_stream_state", "load_stream_state"]

_FORMAT_VERSION = 1
_META_KEY = "__melspec_state_meta__"


def _canon_path(path) -> str:
    """``np.savez`` appends ``.npz`` to extensionless paths while
    ``np.load`` reads the exact path — normalize once so a save/load pair
    given the same argument always refers to the same file."""
    path = os.fspath(path)
    return path if path.endswith(".npz") else path + ".npz"


def _canon_meta(meta: Optional[Mapping[str, Any]]) -> dict:
    if meta is None:
        return {}
    # round-trip through JSON so saved-then-loaded values compare equal
    # to freshly computed ones (tuples become lists, ints stay ints)
    return json.loads(json.dumps(dict(meta), sort_keys=True))


def save_stream_state(path, state, meta: Optional[Mapping[str, Any]] = None
                      ) -> None:
    """Checkpoint a carried-state pytree to one ``.npz`` file.

    ``state`` is any pytree of arrays (``MultiStreamState``,
    ``FrontendState``, ``SourceRateState``, …). ``meta`` is an optional
    JSON-serializable mapping stored alongside and enforced by
    :func:`load_stream_state` — pass the owning object's config
    fingerprint.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {}
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        if a.dtype == object:
            raise TypeError(f"state leaf {i} is not an array: {leaf!r}")
        arrays[f"leaf_{i}"] = a
    header = json.dumps({
        "version": _FORMAT_VERSION,
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "meta": _canon_meta(meta),
    }, sort_keys=True)
    arrays[_META_KEY] = np.frombuffer(header.encode("utf-8"), np.uint8)
    # atomic replace: the natural usage re-saves to the same path
    # periodically, and a preemption mid-write must not destroy the
    # previous good checkpoint (the exact failure this module exists for)
    path = _canon_path(path)
    tmp = path + ".tmp.npz"  # .npz suffix: savez would append it anyway
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_stream_state(path, like, meta: Optional[Mapping[str, Any]] = None):
    """Load a checkpoint written by :func:`save_stream_state`.

    ``like`` is a template state with the expected structure — pass the
    target object's ``init()`` output. The checkpoint must match its
    pytree structure and every leaf's shape and dtype; if ``meta`` is
    given it must equal the saved meta exactly. Returns the state as
    device arrays, unflattened into ``like``'s structure.
    """
    import zipfile

    like_leaves, like_treedef = jax.tree_util.tree_flatten(like)
    try:
        ctx = np.load(_canon_path(path))
    except (zipfile.BadZipFile, ValueError, EOFError) as e:
        raise ValueError(f"{path}: corrupt or not an .npz checkpoint "
                         f"({e})") from e
    with ctx as z:
        if _META_KEY not in z:
            raise ValueError(f"{path}: not a melspec stream checkpoint")
        try:
            header = json.loads(bytes(z[_META_KEY]).decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ValueError(f"{path}: corrupt checkpoint header "
                             f"({e})") from e
        if header.get("version") != _FORMAT_VERSION:
            raise ValueError(
                f"{path}: checkpoint version {header.get('version')!r}, "
                f"expected {_FORMAT_VERSION}")
        if header["treedef"] != str(like_treedef):
            raise ValueError(
                f"{path}: state structure mismatch — checkpoint is "
                f"{header['treedef']}, target expects {like_treedef}")
        if meta is not None and header["meta"] != _canon_meta(meta):
            raise ValueError(
                f"{path}: config mismatch — checkpoint meta "
                f"{header['meta']} != expected {_canon_meta(meta)}; "
                "resuming across configs would corrupt the frame grid")
        if header.get("n_leaves") != len(like_leaves):
            raise ValueError(
                f"{path}: {header.get('n_leaves')} leaves in the "
                f"checkpoint, target expects {len(like_leaves)}")
        leaves = []
        for i, ref in enumerate(like_leaves):
            if f"leaf_{i}" not in z:
                raise ValueError(f"{path}: truncated checkpoint — "
                                 f"leaf_{i} missing")
            a = z[f"leaf_{i}"]
            ref = np.asarray(ref)
            if a.shape != ref.shape or a.dtype != ref.dtype:
                raise ValueError(
                    f"{path}: leaf {i} is {a.dtype}{list(a.shape)}, "
                    f"target expects {ref.dtype}{list(ref.shape)}")
            leaves.append(jnp.asarray(a))
    return jax.tree_util.tree_unflatten(like_treedef, leaves)
