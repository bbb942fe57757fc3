"""On-chip A/B: plain sig kernel vs fused u8 wire-record emission.

Targeted re-measure for VERDICT r3 item 3 (quantized_sig must reach
>= 0.8x the plain sig row). Uses bench.py's slope-calibrated `_bench`
on the 64x10s config.

Tunnel throughput swings entire multi-minute windows by 3-8x, so
sequential rows are NOT comparable: this tool measures in INTERLEAVED
rounds (plain, v1, v2, ... repeated) and reports each variant's median
per-round ratio against the plain row of the SAME round.

Usage: python tools/quant_ab.py [variant ...]
       (default: '' oldmath; variants: noreduce i32store lanes128 norng)
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _bench  # noqa: E402

ROUNDS = 5


def main():
    from melspec_tpu.ops.mel_kernel import (whisper_mel_quantized,
                                            whisper_mel_sig)

    variants = sys.argv[1:] or ["", "oldmath"]

    SR = 16000
    batch, t = 64, 10 * SR
    key = jax.random.PRNGKey(0)
    xs = [jax.random.normal(k, (batch, t), dtype=jnp.float32) * 0.1
          for k in jax.random.split(key, 3)]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR

    fns = {"plain": lambda x: whisper_mel_sig(x)}
    for v in variants:
        fns[v or "tree"] = (
            lambda x, v=v: whisper_mel_quantized(x, 400, 160, 80, 16000.0,
                                                 qabl=v)[0])

    # compile pass (one cheap call each) so rounds measure steady state
    for name, fn in fns.items():
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.sum(fn(xs[0]).astype(jnp.float32)))
        print(f"compiled {name} in {time.perf_counter()-t0:.0f}s",
              flush=True)

    walls = {name: [] for name in fns}
    for r in range(ROUNDS):
        for name, fn in fns.items():
            w = _bench(fn, xs, iters=8, reps=1)
            walls[name].append(w)
        line = " ".join(
            f"{name}={walls[name][-1]*1e3:.2f}ms" for name in fns)
        print(f"round {r}: {line}", flush=True)

    plain = walls["plain"]
    print(f"plain best: {min(plain)*1e3:.2f} ms "
          f"({audio_s/min(plain):,.0f}x RT)", flush=True)
    for name in fns:
        if name == "plain":
            continue
        ratios = [plain[i] / walls[name][i] for i in range(ROUNDS)]
        med = statistics.median(ratios)
        print(f"[{name}] per-round ratios: "
              + " ".join(f"{x:.3f}" for x in ratios)
              + f" -> median {med:.3f}; best wall {min(walls[name])*1e3:.2f}"
              f" ms ({audio_s/min(walls[name]):,.0f}x RT)", flush=True)


if __name__ == "__main__":
    main()
