"""Round-4 ablation matrix for the composite frontend step (VERDICT r3
item 4, target >= 175k x RT at 64x10s = device <= 3.66 ms):

- flat2048 (HISTORICAL, round 4): a 2048-row epilogue tile
  (pos_tile 128 -> 256 frames/clip) measured a wash vs the default —
  see docs/ROADMAP.md. The env knob that selected it is retired; tile
  sizes are now the kernels' explicit ``flat_rows`` argument
  (tools/flat_rows_ab.py sweeps it for the plain kernel).
- xla_vad: pair kernel WITHOUT the fused VAD epilogue (free to use the
  512-row tile) + classify_columns on the mel in XLA.
- composite: the shipped step, for the same-session baseline.
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tools.devtime import devtime


def main():
    from melspec_tpu.config import DetectionSettings
    from melspec_tpu.parallel.sharding import sharded_frontend_step
    from melspec_tpu.ops.sig_multihead import WhisperKaldiFused
    from melspec_tpu.ops.vad import classify_columns

    SR = 16000
    batch, t = 64, 10 * SR
    key = jax.random.PRNGKey(0)
    xs = [jax.random.normal(k, (batch, t), dtype=jnp.float32) * 0.1
          for k in jax.random.split(key, 3)]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("batch",))
    step = sharded_frontend_step(mesh, DetectionSettings())
    n_valid = jnp.full((batch,), t, jnp.int32)
    pair = WhisperKaldiFused()
    settings = DetectionSettings()

    def composite(x):
        out = step(x, n_valid)
        return jnp.stack([
            out["mel"].reshape(-1)[0], out["nemo"].reshape(-1)[0],
            out["fbank"].reshape(-1)[0],
            out["mel_q8"].reshape(-1)[0].astype(jnp.float32),
            out["vad_active_columns"].astype(jnp.float32).reshape(()),
        ])

    @jax.jit
    def pair_xla_vad(x):
        mel, fbank = pair.compute(x)
        img = jnp.swapaxes(mel, -1, -2)
        raw = classify_columns(img, settings)
        return jnp.stack([mel.reshape(-1)[0], fbank.reshape(-1)[0],
                          jnp.sum(raw.astype(jnp.float32))])

    fns = {
        "composite": composite,
        "pair_vad": lambda x: jnp.stack(
            [o.reshape(-1)[0].astype(jnp.float32)
             for o in pair.compute_with_vad(x, settings)]),
        "pair_xla_vad": pair_xla_vad,
    }
    res = devtime(fns, xs, match="jit_")
    for name, ms in res.items():
        print(f"{name}: {ms:.3f} ms device -> {audio_s/(ms/1e3):,.0f}x RT",
              flush=True)


if __name__ == "__main__":
    main()
