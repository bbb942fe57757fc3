"""Flat-mode tile-size ablation: MXU rows per tile (the kernels'
``flat_rows`` static argument) for the plain whisper sig kernel at
64x10s, device time. ``flat_rows`` is a real jit cache key, so one
process can sweep every size:

    python tools/flat_rows_ab.py 256 512 1024 2048
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tools.devtime import devtime


def main():
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig

    SR = 16000
    batch, t = 64, 10 * SR
    xs = [jax.random.normal(k, (batch, t), dtype=jnp.float32) * 0.1
          for k in jax.random.split(jax.random.PRNGKey(0), 3)]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR

    sizes = [int(a) for a in sys.argv[1:]] or [256, 512, 1024, 2048]
    for rows in sizes:
        res = devtime(
            {"sig_flat": lambda x: whisper_mel_sig(
                x, input_mode="flat", flat_rows=rows)},
            xs, match="jit_")
        ms = res["sig_flat"]
        print(f"rows={rows}: {ms:.3f} ms -> "
              f"{audio_s/(ms/1e3):,.0f}x RT device", flush=True)


if __name__ == "__main__":
    main()
