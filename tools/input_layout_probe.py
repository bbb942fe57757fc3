"""Probe: pin the [B, T] audio input's device layout to the macro-row
tiling ((row_w,), (8, 128)) so `_sig_host_prep`'s reshape
[B,T] -> [B,R,row_w] becomes a bitcast (the 2D tiled bytes are then
IDENTICAL to the 3D default layout's). Checks:
  1. correctness: whisper_mel_sig(pinned input) == whisper_mel_sig(plain)
  2. device time: does reshape.8 / the 41 MB copy disappear?
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax._src.layout import Layout, Format

from tools.devtime import devtime


def main():
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig

    SR = 16000
    batch, t = 64, 10 * SR
    key = jax.random.PRNGKey(0)
    xs = [jax.random.normal(k, (batch, t), dtype=jnp.float32) * 0.1
          for k in jax.random.split(key, 3)]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR

    row_w = 640
    fmt = Format(
        Layout(major_to_minor=(0, 1), tiling=((row_w,), (8, 128))),
        jax.sharding.SingleDeviceSharding(jax.devices()[0]),
    )
    try:
        xs_pin = [jax.device_put(x, fmt) for x in xs]
        jax.block_until_ready(xs_pin)
        print("device_put with custom tiling: OK", flush=True)
        print("pinned format:", xs_pin[0].format, flush=True)
    except Exception as e:
        print(f"device_put FAILED [{type(e).__name__}] "
              f"{str(e).splitlines()[0][:200]}", flush=True)
        return

    # correctness first
    a = np.asarray(whisper_mel_sig(xs[0]))
    b = np.asarray(whisper_mel_sig(xs_pin[0]))
    err = float(np.abs(a - b).max())
    print(f"pinned-vs-plain max err: {err}", flush=True)
    if err != 0.0:
        print("NOT bit-identical — investigate before using", flush=True)

    res = devtime(
        {"plain": lambda x: whisper_mel_sig(x)},
        xs, match="jit_")
    res2 = devtime(
        {"pinned": lambda x: whisper_mel_sig(x)},
        xs_pin, match="jit_")
    for name, ms in {**res, **res2}.items():
        print(f"{name}: {ms:.3f} ms -> {audio_s/(ms/1e3):,.0f}x RT device",
              flush=True)


if __name__ == "__main__":
    main()
