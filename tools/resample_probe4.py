"""Op-level device-lane dump of the COMPOSED source-rate serving tick
(conv vs kernel resampler) — where does the src48 tax actually live?"""
import collections
import glob
import gzip
import json
import shutil
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def dump(tag, fn, xs):
    jax.block_until_ready(jnp.sum(fn(xs[0])))
    root = f"/tmp/resample_probe4_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    with jax.profiler.trace(root):
        ys = [fn(x) for x in xs]
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
    n = len(xs)
    print(f"--- {tag} ---", flush=True)
    for name, us in sorted(dur.items(), key=lambda kv: -kv[1])[:14]:
        print(f"{us/n/1e3:8.3f} ms x{cnt[name]//n}  {name[:100]}",
              flush=True)


def main():
    from melspec_tpu.config import DetectionSettings, MelConfig
    from melspec_tpu.streaming.serving import (MultiStreamFrontend,
                                               SourceRateFrontend)

    n_s, n_h = 256, 500
    cfg = MelConfig(400, 160, 80, 16000.0)
    active = jnp.ones(n_s, bool)
    keys = jax.random.split(jax.random.PRNGKey(7), 2)

    front = MultiStreamFrontend(cfg, n_s, DetectionSettings())
    fstate = front.init()
    xs16 = [jax.random.normal(k, (n_s, n_h * cfg.hop_size), jnp.float32)
            * 0.1 for k in keys]
    jax.block_until_ready(xs16)
    dump("plain", lambda x: front._tick_jit(fstate, x, active)[1]
         .astype(jnp.float32), xs16)
    del xs16

    for impl in ("conv", "kernel"):
        sf = SourceRateFrontend(cfg, n_s, input_rate=48000,
                                resample_impl=impl)
        st = sf.init()
        xs = [jax.random.normal(k, (n_s, n_h * sf.hop_src), jnp.float32)
              * 0.1 for k in keys]
        jax.block_until_ready(xs)
        dump(impl, lambda x, sf=sf, st=st: sf._tick_jit(st, x, active)[1]
             .astype(jnp.float32), xs)


if __name__ == "__main__":
    main()
