"""Device-time A/B: does pinning the composite step's big outputs to the
kernel-natural row-major layout ({2,1,0}) remove the ~0.2 ms/call of XLA
layout-conversion copies seen in the jit_local_step trace (copy.27-30:
[64,998,80] {1,2,0} <- {2,1,0})?
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.experimental.layout import Layout, Format

from tools.devtime import devtime


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

    def consume(out):
        return jnp.stack([
            jnp.sum(out["mel"]), jnp.sum(out["nemo"]),
            jnp.sum(out["fbank"]),
            jnp.sum(out["mel_q8"].astype(jnp.float32)),
            out["vad_active_columns"].astype(jnp.float32).reshape(()),
        ])

    @jax.jit
    def baseline(x):
        return consume(dict(step(x, n_valid)))

    # variant: same step but with row-major layout constraints on the
    # three [B, F, M] outputs, applied inside one wrapping jit
    rowmajor = Layout(major_to_minor=(0, 1, 2))

    @jax.jit
    def pinned(x):
        from jax.experimental.layout import with_layout_constraint

        out = dict(step(x, n_valid))
        for k in ("mel", "fbank", "mel_q8"):
            out[k] = with_layout_constraint(out[k], rowmajor)
        return consume(out)

    res = devtime({"baseline": baseline, "pinned": pinned}, xs,
                  match="jit_")
    for name, ms in res.items():
        print(f"{name}: {ms:.3f} ms -> {audio_s/(ms/1e3):,.0f}x RT device",
              flush=True)


if __name__ == "__main__":
    main()
