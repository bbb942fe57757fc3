"""Probe: can a Pallas TPU kernel DMA macro-rows straight out of a FLAT
[B, T] HBM operand (via an in-kernel ref reshape), so `_sig_host_prep`'s
[B,T] -> [B,R,W] relayout copy (0.178 ms/call at 64x10s, ~5% of the
256x300s headline) can be deleted?

Tries, in order of preference:
  1. sig_ref.reshape(B, R, W) on the HBM ref inside the kernel
  2. sig_ref.at[b] -> 1D, then .reshape(R, W)
  3. bitcast/other views if available
Each is checked for *correctness* against the host reshape.
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, R, W = 4, 16, 640
T = R * W


def make_kernel(mode):
    def kernel(sig_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        if mode == "reshape3d":
            src = sig_ref.reshape(B, R, W).at[b]
        elif mode == "reshape2d":
            src = sig_ref.at[b].reshape(R, W)
        elif mode == "baseline3d":
            src = sig_ref.at[b]
        cp = pltpu.make_async_copy(src, scratch, sem)
        cp.start()
        cp.wait()
        out_ref[0] = scratch[:]

    return kernel


def run(mode):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T)), jnp.float32)
    operand = x.reshape(B, R, W) if mode == "baseline3d" else x
    out = pl.pallas_call(
        make_kernel(mode),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, R, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(operand)
    ref = np.asarray(x).reshape(B, R, W)
    err = float(np.abs(np.asarray(out) - ref).max())
    print(f"{mode}: max err {err}", flush=True)
    return err == 0.0


if __name__ == "__main__":
    for mode in ("baseline3d", "reshape3d", "reshape2d"):
        try:
            ok = run(mode)
            print(f"{mode}: {'OK' if ok else 'WRONG RESULT'}", flush=True)
        except Exception as e:
            print(f"{mode}: FAILED [{type(e).__name__}] "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
