"""On-chip device-time A/B for VERDICT r4 item 5: the three-head fused
kernel (whisper + kaldi + NeMo over ONE shared DMA + slice cascade,
``WhisperKaldiNemoFused``) vs the shipped composition (pair kernel with
VAD epilogue + standalone sig-route ``BatchLogMel``) at 64x10 s.

The NeMo head pays its preemphasis/center fold (pack 400 -> 401-tap
window at a different offset; shared tile widens 512 -> 768) in exchange
for sharing the signal DMA, frame assembly and bf16 cascade. Ship only
if the composite step beats the shipped 3.638 ms device
(docs/ROADMAP.md item 2).
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tools.devtime import devtime  # noqa: E402


def main():
    from melspec_tpu.config import DetectionSettings
    from melspec_tpu.ops.batch_logmel import BatchLogMel
    from melspec_tpu.ops.sig_multihead import (WhisperKaldiFused,
                                               WhisperKaldiNemoFused)

    SR = 16000
    batch, t = 64, 10 * SR
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    xs = [jax.random.normal(k, (batch, t), dtype=jnp.float32) * 0.1
          for k in keys]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR

    settings = DetectionSettings()
    pair = WhisperKaldiFused()
    nemo = BatchLogMel(fft_impl="sig")
    tri = WhisperKaldiNemoFused()

    @jax.jit
    def shipped(x):
        mel, fbank, raw = pair.compute_with_vad(x, settings)
        feats = nemo.compute(x)
        return jnp.stack([mel[0, 0, 0], fbank[0, 0, 0], feats[0, 0, 0],
                          raw.astype(jnp.float32)[0, 0]])

    @jax.jit
    def fused3(x):
        mel, fbank, feats, raw = tri.compute_with_vad(x, settings)
        return jnp.stack([mel[0, 0, 0], fbank[0, 0, 0], feats[0, 0, 0],
                          raw.astype(jnp.float32)[0, 0]])

    res = devtime({"shipped_pair+nemo": shipped, "tri_fused": fused3},
                  xs, match="")
    for k, v in res.items():
        print(f"{k}: {v:.3f} ms device -> {audio_s/(v/1e3):,.0f}x RT",
              flush=True)



def main_novad():
    """compute()-only variant: without the VAD epilogue the tri kernel
    rides the FLAT path (256-row tiles fit VMEM)."""
    from melspec_tpu.ops.batch_logmel import BatchLogMel
    from melspec_tpu.ops.sig_multihead import (WhisperKaldiFused,
                                               WhisperKaldiNemoFused)

    SR = 16000
    batch, t = 64, 10 * SR
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    xs = [jax.random.normal(k, (batch, t), dtype=jnp.float32) * 0.1
          for k in keys]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR
    pair = WhisperKaldiFused()
    nemo = BatchLogMel(fft_impl="sig")
    tri = WhisperKaldiNemoFused()

    @jax.jit
    def shipped(x):
        mel, fbank = pair.compute(x)
        feats = nemo.compute(x)
        return jnp.stack([mel[0, 0, 0], fbank[0, 0, 0], feats[0, 0, 0]])

    @jax.jit
    def fused3(x):
        mel, fbank, feats = tri.compute(x)
        return jnp.stack([mel[0, 0, 0], fbank[0, 0, 0], feats[0, 0, 0]])

    res = devtime({"novad_pair+nemo": shipped, "novad_tri": fused3},
                  xs, match="")
    for k, v in res.items():
        print(f"{k}: {v:.3f} ms device -> {audio_s/(v/1e3):,.0f}x RT",
              flush=True)


if __name__ == "__main__":
    if "--novad" in sys.argv:
        main_novad()
    else:
        main()
