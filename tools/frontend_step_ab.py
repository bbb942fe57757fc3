"""On-chip measurement of the FULL composite frontend step (whisper mel
+ NeMo log-mel + Kaldi fbank + fused VAD + 8-bit quant as one SPMD
program) at 64x10s — VERDICT r3 item 4's target row (>= 175k x RT).

Also measures the step's three component frontends standalone in the
same session so the composite's harmonic bound is visible next to it.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from bench import _bench  # noqa: E402


def main():
    from melspec_tpu.config import DetectionSettings
    from melspec_tpu.parallel.sharding import sharded_frontend_step

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

    def composite(x):
        out = step(x, n_valid)
        return jnp.stack([
            jnp.sum(out["mel"]), jnp.sum(out["nemo"]),
            jnp.sum(out["fbank"]),
            jnp.sum(out["mel_q8"].astype(jnp.float32)),
            out["vad_active_columns"].astype(jnp.float32).reshape(()),
        ])

    def row(name, fn):
        t0 = time.perf_counter()
        wall = _bench(fn, xs, iters=8, reps=3)
        print(f"{name}: {wall*1e3:.2f} ms -> {audio_s/wall:,.0f}x RT "
              f"(measured in {time.perf_counter()-t0:.0f}s)", flush=True)
        return wall

    walls = {}
    walls["frontend_step"] = row("frontend_step", composite)

    if "--components" in sys.argv:
        from melspec_tpu.ops.batch_logmel import BatchLogMel
        from melspec_tpu.ops.sig_multihead import WhisperKaldiFused

        nemo = BatchLogMel(fft_impl="sig")
        pair = WhisperKaldiFused()
        walls["nemo"] = row("nemo_sig", nemo.compute)
        walls["pair"] = row(
            "whisper_kaldi_pair",
            lambda x: jnp.stack([jnp.sum(o) for o in pair.compute(x)]))
        walls["frontend_step2"] = row("frontend_step(re)", composite)
        hb = walls["nemo"] + walls["pair"]
        print(f"component sum bound: {hb*1e3:.2f} ms -> "
              f"{audio_s/hb:,.0f}x RT", flush=True)


if __name__ == "__main__":
    main()
