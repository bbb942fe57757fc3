"""Measured roofline decomposition of the flagship sig kernel: device
time vs slice-pair block count (the ks/cutoff dial of whisper_mel_sig).
t(blocks) ~ a + b*blocks separates the per-block MXU+cascade cost (b)
from the block-independent floor a (DMA, frame assembly, projection,
log/norm epilogue, stores). Accuracy changes with the dial, so only the
SHIPPED (ks=3, cutoff=2) point is a product configuration — the others
exist purely to locate the headroom (docs/ROADMAP.md item 9).
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

    # (ks, cutoff) -> blocks: (1,0)->1, (2,1)->3, (3,2)->6
    fns = {
        f"blocks{n}": (lambda x, ks=ks, co=co:
                       whisper_mel_sig(x, ks=ks, cutoff=co))
        for n, ks, co in ((1, 1, 0), (3, 2, 1), (6, 3, 2))
    }
    res = devtime(fns, xs)
    for name, ms in res.items():
        print(f"{name}: {ms:.3f} ms device -> {audio_s/(ms/1e3):,.0f}x RT",
              flush=True)
    if all(f"blocks{n}" in res for n in (1, 3, 6)):
        t1, t3, t6 = (res[f"blocks{n}"] for n in (1, 3, 6))
        b = (t6 - t1) / 5.0
        print(f"per-block cost ~{b*1e3:.0f} us; block-independent floor "
              f"~{(t1 - b):.3f} ms; shipped dot+cascade share "
              f"~{6*b/t6*100:.0f}% of {t6:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
