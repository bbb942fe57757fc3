"""Device-time A/B: the Pallas resample kernel's HIGHEST (6-pass) dot
vs the manual 3-slice bf16 dot (``precision="bf3"``) at the serving
shape (VERDICT r4 item 1 follow-up; parity measured ~7e-6 relative —
over the resampler's own 2e-6 bar, within the mel pipeline's 1e-5).

Run: python tools/resample_bf3_ab.py [n_streams n_hops]
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tools.devtime import devtime


def main():
    from melspec_tpu.ops.resample import pallas_resample

    n_s = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_h = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    up, down, hop = 1, 3, 160
    q = n_h * hop                      # output samples / up
    t_src = q * down + 2048            # slack for the slab grid
    x = jax.random.normal(jax.random.PRNGKey(0), (n_s, t_src),
                          jnp.float32) * 0.1
    jax.block_until_ready(x)

    f_hi = jax.jit(lambda s: pallas_resample(s, up, down, q))
    f_b3 = jax.jit(lambda s: pallas_resample(s, up, down, q,
                                             precision="bf3"))
    a, b = f_hi(x), f_b3(x)
    rel = float(jnp.max(jnp.abs(a - b)) /
                jnp.max(jnp.abs(a)))
    print(f"max rel delta bf3 vs HIGHEST: {rel:.3e}", flush=True)

    ms = devtime({"highest": f_hi, "bf3": f_b3}, [x], match="jit_")
    print({k: round(v, 4) for k, v in ms.items()})
    print(f"speedup: {ms['highest'] / ms['bf3']:.3f}x")


if __name__ == "__main__":
    main()
