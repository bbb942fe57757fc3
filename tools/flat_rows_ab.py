"""Flat-mode tile-size ablation: MXU rows per tile (MELSPEC_FLAT_ROWS)
for the plain whisper sig kernel at 64x10s, device time. One size per
process (the jit caches on traced-time geometry):

    for r in 256 512 1024 2048; do
        MELSPEC_FLAT_ROWS=$r python tools/flat_rows_ab.py; done
"""
import os
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

    rows = os.environ.get("MELSPEC_FLAT_ROWS", "512(default)")
    res = devtime(
        {"sig_flat": lambda x: whisper_mel_sig(x, input_mode="flat")},
        xs, match="jit_")
    ms = res["sig_flat"]
    print(f"rows={rows}: {ms:.3f} ms -> {audio_s/(ms/1e3):,.0f}x RT device",
          flush=True)


if __name__ == "__main__":
    main()
