"""Device-time attribution for the composite frontend step (VERDICT r3
item 4): exact on-chip per-call ms for the full SPMD step vs its two
kernels (NeMo sig, whisper+kaldi fused pair) and the XLA-only epilogue
(smooth/psum/quant), via one profiler trace per candidate.
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
    from melspec_tpu.ops.batch_logmel import BatchLogMel
    from melspec_tpu.ops.sig_multihead import WhisperKaldiFused

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
    nemo = BatchLogMel(fft_impl="sig")
    pair = WhisperKaldiFused()
    settings = DetectionSettings()

    def composite(x):
        out = step(x, n_valid)
        return jnp.stack([
            jnp.sum(out["mel"]), jnp.sum(out["nemo"]),
            jnp.sum(out["fbank"]),
            jnp.sum(out["mel_q8"].astype(jnp.float32)),
            out["vad_active_columns"].astype(jnp.float32).reshape(()),
        ])

    fns = {
        "composite": composite,
        "nemo": nemo.compute,
        "pair": lambda x: jnp.stack(
            [jnp.sum(o) for o in pair.compute(x)]),
        "pair_vad": lambda x: jnp.stack(
            [jnp.sum(o.astype(jnp.float32))
             for o in pair.compute_with_vad(x, settings)]),
    }
    # match="" catches ALL device events (the XLA epilogue fusions too),
    # so composite - nemo - pair_vad is the epilogue's device cost
    res = devtime(fns, xs, match="jit_")
    for name, ms in res.items():
        print(f"{name}: {ms:.3f} ms device -> {audio_s/(ms/1e3):,.0f}x RT",
              flush=True)
    if all(k in res for k in ("composite", "nemo", "pair_vad")):
        epi = res["composite"] - res["nemo"] - res["pair_vad"]
        print(f"epilogue residual (composite - nemo - pair_vad): "
              f"{epi:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
