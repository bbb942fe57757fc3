"""Op-level device-lane dump for one resample-step candidate: which ops
inside the executable burn the time (trace events below the jit span)."""
import collections
import glob
import gzip
import json
import shutil
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


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

    prec = jax.lax.Precision.HIGH

    @jax.jit
    def blocks(x):
        nblk = -(-kb // stride)
        tn = (qm + nblk - 1) * stride
        x3 = x[:, :tn].reshape(S, qm + nblk - 1, stride)
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

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (S, L + n), jnp.float32) * 0.1
    jax.block_until_ready(x)
    jax.block_until_ready(blocks(x))

    root = "/tmp/resample_probe3"
    shutil.rmtree(root, ignore_errors=True)
    with jax.profiler.trace(root):
        ys = [blocks(x + jnp.float32(i * 1e-6)) for i in range(3)]
        jax.block_until_ready(ys)

    files = glob.glob(root + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(max(files)) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    for name, us in sorted(dur.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{us/3/1e3:8.3f} ms x{cnt[name]//3}  {name[:110]}")


if __name__ == "__main__":
    main()
