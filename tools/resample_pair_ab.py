"""Device-time A/B: the streaming resample step as
``pallas_resample(concat(buf, chunks))`` (round-5 shipped state) vs the
two-input ``pallas_resample_pair(buf, chunks)`` — the only difference is
whether the carried tail is prepended with a materialized full-signal
HBM concat (~245 MB at 256x500 hops, 48 k) or tile t=0's slab alone is
assembled host-side (~50 MB) while t>0 slabs DMA straight from chunks.
Outputs are bit-identical (test_serving.py). Also prints the same-session
SourceRateFrontend tick vs the plain MultiStreamFrontend tick ratio.

Run: python tools/resample_pair_ab.py [n_streams n_hops]
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tools.devtime import devtime


def main():
    from melspec_tpu.ops.resample import (pallas_resample,
                                          pallas_resample_pair)
    from melspec_tpu.streaming.resample import MultiStreamResampler

    n_s = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_h = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    up, down, hop = 1, 3, 160
    mr = MultiStreamResampler(up, down, n_s, align=hop, impl="kernel",
                              precision="bf3")
    L = mr._len
    n = n_h * hop * down               # source samples per tick
    q = n // down
    key = jax.random.PRNGKey(0)
    buf = jax.random.normal(key, (n_s, L), jnp.float32) * 0.1
    chunks = jax.random.normal(key, (n_s, n), jnp.float32) * 0.1
    jax.block_until_ready((buf, chunks))

    f_a = jax.jit(lambda b, c: pallas_resample(
        jnp.concatenate([b, c], axis=-1), up, down, q, precision="bf3"))
    f_b = jax.jit(lambda b, c: pallas_resample_pair(
        b, c, up, down, q, precision="bf3"))
    ya, yb = f_a(buf, chunks), f_b(buf, chunks)
    print("bit-equal:", bool(jnp.all(ya == yb)), flush=True)

    ms = devtime({"concat": lambda c: f_a(buf, c),
                  "pair": lambda c: f_b(buf, c)}, [chunks], match="jit_")
    print({k: round(v, 4) for k, v in ms.items()})
    print(f"step speedup: {ms['concat'] / ms['pair']:.3f}x")

    # same-session serving tick ratio (the VERDICT r4 item-1 metric)
    from melspec_tpu.streaming.serving import (MultiStreamFrontend,
                                               SourceRateFrontend)

    plain = MultiStreamFrontend(n_streams=n_s)
    src = SourceRateFrontend(n_streams=n_s, input_rate=48000)
    sp, ss = plain.init(), src.init()
    cp = jax.random.normal(key, (n_s, n_h * hop), jnp.float32) * 0.1
    cs = jax.random.normal(key, (n_s, n_h * src.hop_src),
                           jnp.float32) * 0.1
    act = jnp.ones(n_s, bool)
    jax.block_until_ready((cp, cs))
    ms_p = devtime(
        {"plain_tick": lambda c: plain._tick_jit(sp, c, act)[1]},
        [cp], match="jit_")
    ms_s = devtime(
        {"src48_tick": lambda c: src._tick_jit(ss, c, act)[1]},
        [cs], match="jit_")
    print({**{k: round(v, 4) for k, v in ms_p.items()},
           **{k: round(v, 4) for k, v in ms_s.items()}})
    print(f"src48/plain: {ms_s['src48_tick'] / ms_p['plain_tick']:.3f}x")


if __name__ == "__main__":
    main()
