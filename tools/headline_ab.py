"""Wall-clock slope A/B at the HEADLINE config (256 x 300 s): flat input
mode vs rows mode, same session, bench.py's estimator (the profiler
aborts at this trace size, so device-time attribution is unavailable).
One 4.9 GB input + chain="output", exactly like the bench headline row.
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _bench


def main():
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig

    SR = 16000
    batch, t = 256, 300 * SR
    xs = [jax.random.normal(jax.random.PRNGKey(0), (batch, t),
                            dtype=jnp.float32) * 0.1]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR

    for name, mode in (("flat", "flat"), ("rows", "rows"),
                       ("flat2", "flat")):
        fn = lambda x, m=mode: whisper_mel_sig(x, input_mode=m)
        wall = _bench(fn, xs, iters=8, reps=3, chain="output")
        print(f"sig_{name}: {wall*1e3:.2f} ms -> "
              f"{audio_s/wall:,.0f}x RT", flush=True)


if __name__ == "__main__":
    main()
