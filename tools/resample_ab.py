"""On-chip A/B for VERDICT r4 item 1: the source-rate serving tick's
resampler lowering — strided ``conv_general_dilated`` (round 3's fix,
BENCH_r04 ``serving_tick_src48`` 186,677x vs the plain tick's 418,275x)
vs the framed-matmul form (``MultiStreamResampler(impl="frames")``:
``frame_signal`` windows @ the lane-padded phase matrix, the same fast
path every mel pipeline in the repo rides).

Rows (all within-session, slope-calibrated wall via ``bench._bench``):
  - plain serving tick (the no-resample reference ceiling)
  - source-rate tick (48 k ingest) with impl=conv and impl=frames
  - bare resampler step with impl=conv and impl=frames

Run: python tools/resample_ab.py [n_streams n_hops]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _bench  # noqa: E402


def main():
    from melspec_tpu.config import DetectionSettings, MelConfig
    from melspec_tpu.streaming.resample import MultiStreamResampler
    from melspec_tpu.streaming.serving import (MultiStreamFrontend,
                                               SourceRateFrontend)

    n_s = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_h = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    cfg = MelConfig(400, 160, 80, 16000.0)
    settings = DetectionSettings()
    audio_s = n_s * n_h * cfg.hop_size / cfg.sampling_rate
    active = jnp.ones(n_s, bool)

    def row(name, fn, xs):
        t0 = time.perf_counter()
        wall = _bench(fn, xs, iters=8, reps=3)
        print(f"{name}: {wall*1e3:.2f} ms -> {audio_s/wall:,.0f}x RT "
              f"(measured in {time.perf_counter()-t0:.0f}s)", flush=True)
        return wall

    keys = jax.random.split(jax.random.PRNGKey(7), 4)

    # plain-tick reference ceiling, same session
    front = MultiStreamFrontend(cfg, n_s, settings)
    fstate = front.init()
    xs16 = [jax.random.normal(k, (n_s, n_h * cfg.hop_size),
                              jnp.float32) * 0.1 for k in keys[:2]]
    jax.block_until_ready(xs16)
    plain = row("serving_tick_plain", lambda x: front._tick_jit(
        fstate, x, active)[1].astype(jnp.float32), xs16)
    del xs16

    sfront = SourceRateFrontend(cfg, n_s, input_rate=48000,
                                resample_impl="conv")
    src_xs = [jax.random.normal(k, (n_s, n_h * sfront.hop_src),
                                jnp.float32) * 0.1 for k in keys[2:]]
    jax.block_until_ready(src_xs)
    walls = {}
    for impl in ("conv", "frames", "kernel"):
        sf = SourceRateFrontend(cfg, n_s, input_rate=48000,
                                resample_impl=impl)
        st = sf.init()
        walls[impl] = row(f"serving_tick_src48[{impl}]", lambda x, sf=sf,
                          st=st: sf._tick_jit(st, x, active)[1]
                          .astype(jnp.float32), src_xs)
        print(f"  vs plain tick: {walls[impl]/plain:.3f}x the plain "
              f"tick's wall", flush=True)

    # bare resampler step, all lowerings
    flat = src_xs
    for impl in ("conv", "frames", "kernel"):
        mr = MultiStreamResampler(1, 3, n_s, align=cfg.hop_size, impl=impl)
        st = mr.init()
        row(f"resample_step[{impl}]", lambda x, mr=mr, st=st:
            mr._step_jit(st, x, active)[1], flat)


if __name__ == "__main__":
    main()
