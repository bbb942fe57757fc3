"""Device-time kernel A/B via the JAX profiler.

Wall-clock through the remote tunnel swings entire multi-minute windows
by 3-10x, drowning 20-40%% kernel deltas. The profiler's DEVICE lane is
immune: it records each executable's on-chip duration exactly. This tool
traces each candidate a few times (after a warm compile) and reports
per-call device milliseconds.

Library use: ``devtime({"name": fn, ...}, xs)`` -> {name: ms_per_call}.
CLI: ``python tools/devtime.py [quant variants...]`` runs the
plain-vs-quant matrix of tools/quant_ab.py on device time.
"""
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CALLS = 4


def _parse_trace(root: str, match: str) -> dict:
    """Sum device-lane event durations (us) by name for events whose
    name contains ``match``. Returns {name: [durs...]}."""
    files = glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise RuntimeError(f"no trace under {root}")
    path = max(files, key=os.path.getmtime)
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.defaultdict(list)
    for e in ev:
        if (e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), "")
                and match in e.get("name", "")):
            dur[e["name"]].append(e.get("dur", 0))
    return dur


def devtime(fns: dict, xs, match: str = "pallas", calls: int = CALLS,
            verbose: bool = True, inplace_pert: bool = False) -> dict:
    """Per-call device ms for each fn. Each fn is traced separately
    (hashes in executable names are opaque, so one trace per candidate
    is the only robust attribution). ``inplace_pert=True`` perturbs the
    caller's ``xs`` entries in place instead of materializing ``calls``
    perturbed copies — required when the inputs are a large fraction of
    HBM (e.g. the 256x300 s headline: 4.7 GB each)."""
    out = {}
    pert_round = 0
    for name, fn in fns.items():
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.sum(fn(xs[0]).astype(jnp.float32)))
        # anti-memoization input perturbation OUTSIDE the traced window,
        # so its jit_add doesn't count against the candidate
        if inplace_pert:
            for i in range(len(xs)):
                pert_round += 1
                xs[i] = xs[i] + jnp.float32(pert_round * 1e-6)
                jax.block_until_ready(xs[i])
            xp = [xs[i % len(xs)] for i in range(calls)]
        else:
            xp = [xs[i % len(xs)] + jnp.float32(i * 1e-6)
                  for i in range(calls)]
            jax.block_until_ready(xp)
        root = f"/tmp/devtime_{abs(hash(name)) % 10**8}"
        shutil.rmtree(root, ignore_errors=True)
        with jax.profiler.trace(root):
            ys = [fn(xp[i]) for i in range(calls)]
            jax.block_until_ready(ys)
        dur = _parse_trace(root, match)
        # jit wrappers double-count the inner pallas op, so prefer the
        # jit_ entries (whole-executable device span)
        jit_rows = {k: v for k, v in dur.items() if k.startswith("jit_")}
        rows = jit_rows or dur
        if not rows:
            out[name] = float("nan")
            if verbose:
                print(f"{name}: no '{match}' device events", flush=True)
            continue
        # per-call cost = everything the candidate put on the device
        # lane, divided by the KNOWN call count (dividing by the max
        # event count mis-attributed any candidate whose trace contained
        # a small helper jit firing more than once per call)
        total = sum(sum(v) for v in rows.values())
        ms = total / calls / 1e3
        out[name] = ms
        if verbose:
            detail = ", ".join(f"{k}:{len(v)}" for k, v in rows.items())
        if verbose:
            print(f"{name}: {ms:.3f} ms/call device ({detail}; "
                  f"{time.perf_counter()-t0:.0f}s)", flush=True)
    return out


def main():
    from melspec_tpu.ops.mel_kernel import (whisper_mel_quantized,
                                            whisper_mel_sig)

    variants = sys.argv[1:] or [""]
    SR = 16000
    batch, t = 64, 10 * SR
    xs = [jax.random.normal(k, (batch, t), dtype=jnp.float32) * 0.1
          for k in jax.random.split(jax.random.PRNGKey(0), 3)]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR

    fns = {"plain": lambda x: whisper_mel_sig(x)}
    for v in variants:
        fns[v or "default"] = (
            lambda x, v=v: whisper_mel_quantized(x, 400, 160, 80, 16000.0,
                                                 qabl=v)[0])
    res = devtime(fns, xs)
    p = res["plain"]
    print(f"plain: {p:.3f} ms -> {audio_s/(p/1e3):,.0f}x RT device",
          flush=True)
    for name, ms in res.items():
        if name != "plain":
            print(f"[{name}] device ratio plain/quant: {p/ms:.3f} "
                  f"({ms:.3f} ms -> {audio_s/(ms/1e3):,.0f}x RT)",
                  flush=True)


if __name__ == "__main__":
    main()
