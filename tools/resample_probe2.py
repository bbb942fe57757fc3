"""Device-lane breakdown of the resample-step candidates (profiler
trace, immune to tunnel wall noise) — companion to resample_probe.py."""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from tools.devtime import devtime  # noqa: E402


def main():
    S, n = 256, 240000
    up, down, m = 1, 3, 128
    q = n // down
    stride = m * down
    qm = q // m
    L = 510
    from melspec_tpu.ops.resample import _phase_matrix

    g_np, _ = _phase_matrix(up, down, 5.0, m)
    kb = g_np.shape[0]
    HI = jax.lax.Precision.HIGHEST

    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    xs = [jax.random.normal(k, (S, L + n), jnp.float32) * 0.1
          for k in keys]
    jax.block_until_ready(xs)

    @jax.jit
    def conv_h(x):
        needed = (qm - 1) * stride + kb
        y = jax.lax.conv_general_dilated(
            x[:, None, :needed],
            jnp.asarray(g_np.T[:, None, :], jnp.float32),
            window_strides=(stride,), padding=[(0, 0)],
            dimension_numbers=("NCW", "OIW", "NCW"), precision=HI)
        return jnp.swapaxes(y, -1, -2).reshape(S, q * up)

    def pairs(x, prec):
        w = 2 * stride
        qm2 = qm + (qm % 2)
        half = qm2 // 2
        tn = stride * (qm2 + 1)
        pad = max(0, tn - x.shape[-1])
        xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        g2 = jnp.asarray(np.pad(g_np, ((0, w - kb), (0, 0))), jnp.float32)
        a = xp[:, : half * w].reshape(S, half, w)
        bv = xp[:, stride : stride + half * w].reshape(S, half, w)
        ya = jnp.matmul(a, g2, precision=prec)
        yb = jnp.matmul(bv, g2, precision=prec)
        y = jnp.stack([ya, yb], 2).reshape(S, qm2 * m * up)
        return y[:, : q * up]

    def blocks(x, prec):
        nblk = -(-kb // stride)
        tn = (qm + nblk - 1) * stride
        pad = max(0, tn - x.shape[-1])
        xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        x3 = xp[:, :tn].reshape(S, qm + nblk - 1, stride)
        y = None
        for b in range(nblk):
            lo = b * stride
            rows = min(stride, kb - lo)
            gb = jnp.asarray(
                np.pad(g_np[lo : lo + rows], ((0, stride - rows), (0, 0))),
                jnp.float32)
            t = jnp.matmul(x3[:, b : b + qm], gb, precision=prec)
            y = t if y is None else y + t
        return y.reshape(S, q * up)

    def zcat(x, prec):
        # ONE matmul against the column-concatenated block matrices,
        # then shifted-slice ADD on the (small) output: the signal is
        # read once through a contiguous reshape, no input-side copies
        nblk = -(-kb // stride)
        tn = (qm + nblk - 1) * stride
        x3 = x[:, :tn].reshape(S, qm + nblk - 1, stride)
        ch = m * up
        gcat = np.zeros((stride, nblk * ch), np.float64)
        for b in range(nblk):
            rows = min(stride, kb - b * stride)
            gcat[:rows, b * ch : (b + 1) * ch] = g_np[b * stride :
                                                      b * stride + rows]
        z = jnp.matmul(x3, jnp.asarray(gcat, jnp.float32), precision=prec)
        y = z[:, :qm, :ch]
        for b in range(1, nblk):
            y = y + z[:, b : b + qm, b * ch : (b + 1) * ch]
        return y.reshape(S, q * up)

    HIGH = jax.lax.Precision.HIGH
    fns = {
        "conv_H": conv_h,
        "pairs_H": jax.jit(lambda x: pairs(x, HI)),
        "pairs_D": jax.jit(lambda x: pairs(x, None)),
        "blocks_H": jax.jit(lambda x: blocks(x, HI)),
        "blocks_D": jax.jit(lambda x: blocks(x, None)),
        "blocks_HIGH": jax.jit(lambda x: blocks(x, HIGH)),
        "zcat_H": jax.jit(lambda x: zcat(x, HI)),
        "zcat_HIGH": jax.jit(lambda x: zcat(x, HIGH)),
        "zcat_D": jax.jit(lambda x: zcat(x, None)),
    }
    res = devtime(fns, xs, match="")
    for k, v in res.items():
        print(f"{k}: {v:.3f} ms device", flush=True)


if __name__ == "__main__":
    main()
