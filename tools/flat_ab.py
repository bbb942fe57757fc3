"""Device-time A/B: FLAT input mode (batch-on-sublanes framing, no host
macro-row relayout) vs rows mode, on the whisper sig kernel and the
composite frontend step. Optionally the headline config (256x300s) with
--headline."""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tools.devtime import devtime


def main():
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig
    from melspec_tpu.config import DetectionSettings
    from melspec_tpu.parallel.sharding import sharded_frontend_step

    SR = 16000
    headline = "--headline" in sys.argv
    batch, t = (256, 300 * SR) if headline else (64, 10 * SR)
    # headline inputs are 4.7 GB each: 2 calls / 2 preallocated inputs
    # keep devtime's perturbed copies inside HBM
    n_in, calls = (2, 2) if headline else (3, 4)
    key = jax.random.PRNGKey(0)
    xs = [jax.random.normal(k, (batch, t), dtype=jnp.float32) * 0.1
          for k in jax.random.split(key, n_in)]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR

    fns = {
        "sig_rows": lambda x: whisper_mel_sig(x, input_mode="rows"),
        "sig_flat": lambda x: whisper_mel_sig(x, input_mode="flat"),
    }
    if headline:
        # one mode per process: the rows-mode host relayout copy
        # (4.9 GB) plus two 4.7 GB inputs leave no room for both modes'
        # outputs in one session
        for m in ("rows", "flat"):
            if f"--{m}" in sys.argv:
                fns = {f"sig_{m}": fns[f"sig_{m}"]}
    if not headline:
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

        fns["composite"] = composite

    if not headline:
        # correctness on-chip first (compiled, not interpret); skipped at
        # the headline size — no HBM room for both outputs + the rows
        # relayout (CPU interpret tests prove bit-equality already)
        a = np.asarray(fns["sig_rows"](xs[0]))
        b = np.asarray(fns["sig_flat"](xs[0]))
        print(f"on-chip flat-vs-rows max err: {np.abs(a - b).max()}",
              flush=True)

    res = devtime(fns, xs, match="jit_", calls=calls,
                  inplace_pert=headline)
    for name, ms in res.items():
        print(f"{name}: {ms:.3f} ms -> {audio_s/(ms/1e3):,.0f}x RT device",
              flush=True)


if __name__ == "__main__":
    main()
