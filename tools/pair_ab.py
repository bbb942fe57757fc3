"""Device-time ablations for the whisper+kaldi fused pair kernel (the
composite step's expensive half, 2.27 ms/call at 64x10s):

- rows_tile: the pair runs at 64 rows ("measured-best ... VMEM
  pressure"); re-measure 64/96/128 under the current Mosaic.
- kaldi standalone sig kernel, to see what the fusion actually saves
  vs whisper(1.16ms) + kaldi separately.
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tools.devtime import devtime


def main():
    from melspec_tpu.ops.fbank import Fbank
    from melspec_tpu.ops.sig_multihead import WhisperKaldiFused
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig

    SR = 16000
    batch, t = 64, 10 * SR
    key = jax.random.PRNGKey(0)
    xs = [jax.random.normal(k, (batch, t), dtype=jnp.float32) * 0.1
          for k in jax.random.split(key, 3)]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR

    fns = {
        "whisper": lambda x: whisper_mel_sig(x),
        "kaldi": Fbank(fft_impl="sig")._compute_jit,
    }
    for rt in (64, 96, 128):
        pair = WhisperKaldiFused()
        row_w, phases, _ = pair._geom
        pair._geom = (row_w, phases, rt)
        fns[f"pair_rt{rt}"] = (
            lambda x, p=pair: jnp.stack(
                [jnp.sum(o) for o in p.compute(x)]))

    res = devtime(fns, xs, match="jit_")
    for name, ms in res.items():
        print(f"{name}: {ms:.3f} ms -> {audio_s/(ms/1e3):,.0f}x RT device",
              flush=True)


if __name__ == "__main__":
    main()
