"""One-off probe: where does the source-rate resample step's device time
go? Floors for the 256x500-hop 48k tick shape (q=80000, m=128):
raw matmul at the same FLOPs, framing-only data movement, conv at
DEFAULT vs HIGHEST precision. Informs VERDICT r4 item 1."""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench  # noqa: E402


def main():
    S, n = 256, 240000
    up, down, m = 1, 3, 128
    q = n // down
    stride = m * down
    from melspec_tpu.ops.resample import _phase_matrix
    from melspec_tpu.ops import framing

    g_np, _ = _phase_matrix(up, down, 5.0, m)
    kb = g_np.shape[0]
    kb_pad = -(-kb // 128) * 128
    g_pad = jnp.asarray(np.pad(g_np, ((0, kb_pad - kb), (0, 0))),
                        jnp.float32)
    g_f = jnp.asarray(g_np, jnp.float32)
    qm = q // m
    L = 510  # state length for (1,3,align=160)

    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    xs = [jax.random.normal(k, (S, L + n), jnp.float32) * 0.1 for k in keys]
    jax.block_until_ready(xs)

    HI = jax.lax.Precision.HIGHEST

    def conv(x, prec):
        needed = (qm - 1) * stride + kb
        y = jax.lax.conv_general_dilated(
            x[:, None, :needed], g_f.T[:, None, :], window_strides=(stride,),
            padding=[(0, 0)], dimension_numbers=("NCW", "OIW", "NCW"),
            precision=prec)
        return jnp.swapaxes(y, -1, -2).reshape(S, q * up)

    def frames_mm(x, prec):
        needed = (qm - 1) * stride + kb_pad
        pad = max(0, needed - x.shape[-1])
        xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        fr = framing.frame_signal(xp, kb_pad, stride, qm)
        return jnp.matmul(fr, g_pad, precision=prec).reshape(S, q * up)

    def frames_only(x):
        needed = (qm - 1) * stride + kb_pad
        pad = max(0, needed - x.shape[-1])
        xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        fr = framing.frame_signal(xp, kb_pad, stride, qm)
        return jnp.sum(fr, axis=-1)  # force materialization-ish

    a = jax.random.normal(keys[0], (S * qm, kb_pad), jnp.float32)
    b = jax.random.normal(keys[1], (kb_pad, m * up), jnp.float32)
    jax.block_until_ready((a, b))

    def blocks_mm(x, prec, trim=False):
        # overlap-and-add block matmul: window [j*stride, j*stride+kb)
        # spans nblk consecutive stride-blocks; each block term is a
        # matmul over a pure OFFSET view of the contiguous block reshape
        # (no gather, no frames tensor)
        nblk = -(-kb // stride)
        tn = (qm + nblk - 1) * stride
        pad = max(0, tn - x.shape[-1])
        xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        x3 = xp[:, :tn].reshape(S, qm + nblk - 1, stride)
        y = None
        for b in range(nblk):
            lo = b * stride
            rows = min(stride, kb - lo)
            if trim and rows < stride:
                kp = -(-rows // 128) * 128
                lhs = x3[:, b : b + qm, :kp]
                gb = jnp.asarray(
                    np.pad(g_np[lo : lo + rows], ((0, kp - rows), (0, 0))),
                    jnp.float32)
            else:
                lhs = x3[:, b : b + qm]
                gb = jnp.asarray(
                    np.pad(g_np[lo : lo + rows],
                           ((0, stride - rows), (0, 0))), jnp.float32)
            t = jnp.matmul(lhs, gb, precision=prec)
            y = t if y is None else y + t
        return y.reshape(S, q * up)

    def pairs_mm(x, prec):
        # even/odd contiguous-pair matmul: window j covers stride-blocks
        # (j, j+1) = one row of a [.., 2*stride] CONTIGUOUS reshape of
        # the signal offset by j%2 * stride — both matmul operands are
        # free views (offset slice + reshape), zero copies, zero gathers
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

    def row(name, fn, inputs):
        wall = _bench(fn, inputs, iters=8, reps=3)
        print(f"{name}: {wall*1e3:.3f} ms", flush=True)

    row("pairs_HIGHEST", lambda x: pairs_mm(x, HI), xs)
    row("pairs_DEFAULT", lambda x: pairs_mm(x, None), xs)
    row("blocks_full_HIGHEST", lambda x: blocks_mm(x, HI), xs)
    row("blocks_trim_HIGHEST", lambda x: blocks_mm(x, HI, trim=True), xs)
    row("blocks_full_DEFAULT", lambda x: blocks_mm(x, None), xs)
    row("conv_HIGHEST", lambda x: conv(x, HI), xs)
    row("conv_DEFAULT", lambda x: conv(x, None), xs)
    row("frames_mm_HIGHEST", lambda x: frames_mm(x, HI), xs)
    row("frames_mm_DEFAULT", lambda x: frames_mm(x, None), xs)
    row("frames_only", frames_only, xs)
    row("raw_matmul_HIGHEST",
        lambda z: jnp.matmul(z, b, precision=HI), [a, a + 1e-6])
    row("raw_matmul_DEFAULT",
        lambda z: jnp.matmul(z, b), [a, a + 1e-6])


if __name__ == "__main__":
    main()
