"""Single-chip benchmark: batched whisper log-mel throughput (RTFx).

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "x_realtime", "vs_baseline": N}

Baseline: the reference's best published CPU throughput, 484x realtime for
60 s clips on an M1 Pro core (BASELINE.md; README.md:117-123 of the
reference). Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_RTFX = 484.0
SR = 16000


def _bench(fn, inputs, iters=16, reps=2, chain="input"):
    """Slope-calibrated wall seconds per call.

    Defenses, all required for honest numbers through a remote runtime:
    - DISTINCT execute requests (identical requests can be memoized):
      ``chain="input"`` perturbs the input with the carry;
      ``chain="output"`` threads the carry through the reduction only —
      for inputs so large that the input+carry copy would not fit HBM
      (the request still differs per iteration via the carry operand, and
      the compute re-executes fully: remote memoization is per-request,
      not per-subcomputation);
    - a data-dependency chain (iteration i+1 consumes iteration i's
      output, so executions serialize on device);
    - the timed quantity ends with a HOST FETCH of a scalar reduced from
      the final output (block_until_ready can be optimistically signaled;
      a fetched value cannot);
    - the reported time is the SLOPE (T(2+iters) - T(2)) / iters, which
      cancels fixed dispatch/RTT overheads and the fetch itself;
    - each endpoint is the MIN over ``reps`` runs: tunnel RTT jitter is
      strictly additive, so the minimum is the cleanest estimate.
    """
    import jax.numpy as jnp

    # Request distinctness is load-bearing, and the naive "+ carry * tiny"
    # trick is NOT enough: with 0.1-scale inputs a sub-1e-8 perturbation
    # UNDERFLOWS in the f32 add, every chained request repeats
    # bit-identically, and the remote runtime's memoization returns cached
    # results — measured 1.6M x RT for a kernel whose FLOPs bound it
    # ~4x lower (physically impossible => cached, not computed). So:
    # (a) the input chain adds an O(1e-7) scalar derived from the previous
    #     sum (above the ulp of 0.1-scale samples, irrelevant to timing);
    # (b) the output chain halves the carry each step, so the scalar
    #     operand stays bit-distinct for ~24 iterations;
    # (c) every timed() call starts from a FRESH seed (the chain is
    #     otherwise deterministic, and a repeated rep would replay the
    #     exact same request sequence into the cache).
    seed_box = [0]
    if chain == "output":
        g = jax.jit(
            lambda x, c: jnp.sum(fn(x).astype(jnp.float32)) * 1e-30
            + c * 0.5
        )

        def step(i, carry):
            return g(inputs[i % len(inputs)], carry)

        def init_carry():
            seed_box[0] += 1
            return jnp.float32(seed_box[0] * 1e-25)
    else:
        # ONE jitted executable per iteration (like the output chain):
        # unjitted, the perturb/reduce/carry ops around fn were ~8 extra
        # execute requests per iteration, each costing host serialization
        # through the remote tunnel — measured ~0.4 ms/iter of wall that
        # belonged to the harness, not the workload. Distinctness is
        # carried by the (carry, sep) OPERAND VALUES, which differ every
        # call, exactly as in the output chain.
        g = jax.jit(
            lambda x, c, sep: (lambda s: s * (1e-7 / (jnp.abs(s) + 1.0))
                               + jnp.float32(1e-7))(
                jnp.sum(fn(x + (c + sep)).astype(jnp.float32)))
        )

        def step(i, carry):
            # carry keeps the on-device serialization dependency, but its
            # OWN variation cannot carry the distinctness burden: for the
            # benched workloads |s| is huge, so carry converges to a
            # per-input constant within ~2 cycles (its ulp-scale wobble
            # is absorbed by the 0.1-scale add below the input's ulp) and
            # x would repeat with period len(inputs). The (seed, i)-keyed
            # term keeps every request bit-distinct by construction:
            # seeds are spaced 1e-5 apart (>> the 1.9e-6 max iteration
            # term + 4e-7 carry band, so no (seed, i) pair collides) and
            # the whole perturbation stays <= 3e-4 — 0.3% of the signal,
            # irrelevant to timing.
            sep = jnp.float32((seed_box[0] % 29 + 1) * 1e-5
                              + (i + 1) * 1e-7)
            return g(inputs[i % len(inputs)], carry, sep)

        def init_carry():
            seed_box[0] += 1
            return jnp.float32(seed_box[0] * 1e-7)

    def timed(n):
        carry = step(0, init_carry())  # warm (fresh seed: never a replay)
        float(carry)
        t0 = time.perf_counter()
        carry = init_carry()
        for i in range(n):
            carry = step(i, carry)
        float(carry)
        return time.perf_counter() - t0

    t_short = min(timed(2) for _ in range(reps))
    t_long = min(timed(2 + iters) for _ in range(reps))
    return max((t_long - t_short) / iters, 1e-9)


BUDGET_S = float(os.environ.get("MELSPEC_BENCH_BUDGET_S", 1500))


class _BudgetDone(Exception):
    """Bench time budget spent — stop adding optional rows."""


# Physical-impossibility bounds for fused/composite rows: each key row
# computes a STRICT SUPERSET of the work of every row it maps to, so it
# can never truly be faster. A reading above 1.25x the cheapest bounding
# row of the SAME session means a jittery short endpoint slipped past
# min-of-reps (observed once: vad_fields at 3.6Mx vs 743k for its own
# contained kernel) — re-measure with more iterations and keep the
# conservative estimate. The 1.25 slack absorbs the shape differences
# between the 10 s-clip rows and the 500-hop streaming rows.
_SANITY_BOUNDS = {
    "vad_fields_64x10s": ["pallas_sig_64x10s"],
    "quantized_sig_64x10s": ["pallas_sig_64x10s"],
    # head variants of the same signal-input kernel class: a 5x jump
    # over the whisper row is a memoized replay, not speed (observed
    # nemo sig at 2.6M x RT in one r5 session)
    "nemo_logmel_sig_64x10s": ["pallas_sig_64x10s"],
    "kaldi_fbank_sig_64x10s": ["pallas_sig_64x10s"],
    "multistream_bulk_256sx500h": ["xla_f32_256x10s"],
    "multistream_scan_256sx500h": ["xla_f32_256x10s"],
    "multistream_bulk_bf3_256sx500h": ["xla_bf3_256x10s"],
    "multistream_bulk_sig_256sx500h": ["pallas_sig_256x10s"],
    # the composite step CONTAINS the whisper sig kernel (multi-head)
    "frontend_step_64x10s": ["pallas_sig_64x10s"],
    # 128 mels strictly widens the 80-mel kernel's projection
    "pallas_sig128_64x10s": ["pallas_sig_64x10s"],
    "serving_tick_full_256sx500h": ["multistream_bulk_256sx500h",
                                    "multistream_bulk_sig_256sx500h"],
    "serving_tick_src48_256sx500h": ["serving_tick_full_256sx500h"],
}


def _sanity_recheck(row, ffn, xs, wall, audio_s, results, iters=16):
    """Re-measure ``row`` if it claims to beat a kernel it contains."""
    avail = [results[n] for n in _SANITY_BOUNDS.get(row, ())
             if n in results]
    rtfx = audio_s / wall
    if avail and rtfx > 1.25 * min(avail):
        print(f"{row} {rtfx:,.0f}x exceeds its contained-kernel bound "
              f"{min(avail):,.0f}x — re-measuring", file=sys.stderr)
        wall = max(wall, _bench(ffn, xs, iters=iters, reps=3))
        rtfx = audio_s / wall
    return wall, rtfx


def _run_tpu_gate() -> str:
    """Run the compiled-mode golden gates (tests/test_tpu_compiled.py) on
    the real chip in a subprocess. Returns 'pass'/'fail'/'error' — the
    published numbers must ride gate-enforced numerics, not interpret-mode
    CI approximations."""
    import subprocess

    env = dict(os.environ, MELSPEC_TPU_TESTS="1")
    env.pop("JAX_PLATFORMS", None)
    # share the persistent compile cache with the gate subprocess: its
    # Mosaic compiles are the session's slowest, and a congested compile
    # service has pushed single programs past 10 minutes
    cache = jax.config.jax_compilation_cache_dir
    if cache:
        env.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    try:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-m", "tpu", "-q",
             "tests/test_tpu_compiled.py"],
            capture_output=True, text=True, env=env, timeout=900,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except Exception as e:  # noqa: BLE001
        print(f"tpu gate errored: {e!r}"[:200], file=sys.stderr)
        return "error"
    tail = (r.stdout.strip().splitlines() or [""])[-1]
    print(f"tpu compiled-mode gate: {tail}", file=sys.stderr)
    if r.returncode != 0:
        print(r.stdout[-2000:], file=sys.stderr)
    return "pass" if r.returncode == 0 else "fail"


def main() -> None:
    started = time.perf_counter()
    from melspec_tpu.utils.compile_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    print(f"compile cache: {cache_dir}", file=sys.stderr)

    # Device-init watchdog: with the tunnel DOWN, jax.devices() blocks
    # forever inside backend init (observed: >40 min with no progress) and
    # the bench would emit NO JSON line at all. A timed-out init instead
    # reports an honest error row. The timeout only covers init — it is
    # cancelled the moment the backend responds — so a slow-but-alive
    # tunnel session is never killed.
    import threading

    init_done = threading.Event()
    init_timeout = float(os.environ.get("MELSPEC_BENCH_INIT_TIMEOUT_S", 900))

    def _watchdog():
        if not init_done.wait(timeout=init_timeout):
            print(f"device init exceeded {init_timeout:.0f} s — tunnel "
                  "down?", file=sys.stderr)
            print(json.dumps({"metric": "whisper_mel_rtfx", "value": 0,
                              "unit": "x_realtime", "vs_baseline": 0,
                              "error": "device init timed out"}),
                  flush=True)
            os._exit(1)

    threading.Thread(target=_watchdog, daemon=True).start()
    dev = jax.devices()[0]
    init_done.set()
    print(f"bench device: {dev}", file=sys.stderr)

    # compiled-mode golden gates FIRST: a timing headline whose numerics
    # the compiled gates reject must never be published
    tpu_gate = _run_tpu_gate() if dev.platform == "tpu" else "skipped"

    from melspec_tpu.ops.mel_kernel import whisper_mel_pallas
    from melspec_tpu.ops.spectrogram import WhisperMelPipeline

    pipe_bf3 = WhisperMelPipeline(400, 160, 80, 16000.0, dtype=jnp.float32,
                                  fft_impl="bf3")
    pipe = WhisperMelPipeline(400, 160, 80, 16000.0, dtype=jnp.float32,
                              fft_impl="rdft")
    pipe_hp44 = WhisperMelPipeline(400, 160, 80, 16000.0, dtype=jnp.float32,
                                   fft_impl="hp", hp_n_slices=4,
                                   hp_max_pair_sum=4)

    key = jax.random.PRNGKey(0)
    results = {}
    best = (None, 0.0)           # best among ACCURACY-ELIGIBLE backends
    best_any = (None, 0.0)       # best overall (diagnostic only)

    # ordered so the headline (fastest accuracy-eligible backend at the
    # headline config) compiles first: compile service latency must not
    # starve the JSON line. Budget-capped.
    #
    # eligible = JFK parity vs the f64 reference <= 1e-5, TEST-ENFORCED
    # (tests/test_spectrogram.py::test_benched_config_bf3_vs_f64 and the
    # golden gates in test_mel_kernel.py). The headline metric must satisfy
    # the throughput AND accuracy bars simultaneously; xla_f32 (1.3e-5) is
    # reported as a diagnostic but can never be the headline.
    # the last entry is the huge-batch memory-budget config (4.9 GB of
    # signal; exercises the HBM-budget chunking of src/cuda.rs:150-155's
    # analogue) — restricted to the two fast eligible backends
    configs = [("256x10s", 256, 10 * SR, None),
               ("64x10s", 64, 10 * SR, None),
               ("16x60s", 16, 60 * SR, None),
               ("8x300s", 8, 300 * SR, None),
               # pallas_sig only: one 4.9 GB signal + the kernel's exact
               # final-layout output is the whole footprint — but no other
               # backend's materialized-frames tensor fits alongside it
               ("256x300s", 256, 300 * SR, {"pallas_sig"})]
    backends = [
        # pallas_sig: the flagship fused kernel (in-kernel framing,
        # K-concatenated bf16 slice pairs); 3.3e-6 JFK parity on chip
        ("pallas_sig", lambda x: whisper_mel_pallas(x, 400, 160, 80,
                                                    16000.0), True),
        ("xla_bf3", pipe_bf3.mel_batch, True),     # 3.2e-6 JFK parity
        ("pallas_bf3", lambda x: whisper_mel_pallas(x, 400, 160, 80, 16000.0,
                                                    impl="bf3"), True),
        ("pallas_hp8", lambda x: whisper_mel_pallas(x, 400, 160, 80, 16000.0,
                                                    impl="hp8"), True),  # 1.5e-6
        ("xla_f32", pipe.mel_batch, False),        # 1.3e-5: over the bar
        ("xla_hp44", pipe_hp44.mel_batch, True),   # 1.07e-6 parity
        ("pallas_hp", lambda x: whisper_mel_pallas(x, 400, 160, 80, 16000.0,
                                                   hp=True), True),  # 3e-7
    ]

    for name, batch, t, only in configs:
        n_inputs = 1 if batch * t > 10**9 // 4 else 3
        keys = jax.random.split(key, n_inputs)
        xs = [jax.random.normal(k, (batch, t), dtype=jnp.float32) * 0.1
              for k in keys]
        jax.block_until_ready(xs)
        audio_s = batch * t / SR
        for backend, fn, eligible in backends:
            if only is not None and backend not in only:
                continue
            if time.perf_counter() - started > BUDGET_S and best[0]:
                print("bench budget exhausted; reporting best so far",
                      file=sys.stderr)
                break
            try:
                # one extra rep for the headline candidate: the tunnel's
                # additive jitter makes min-of-reps the right estimator,
                # and the reported number should be the steadiest one.
                # chain="output" for the 4.9 GB config: the input-perturb
                # chain would keep two signal copies alive and OOM.
                wall = _bench(fn, xs,
                              reps=3 if backend == "pallas_sig" else 2,
                              chain="output" if batch * t > 10**9 // 4
                              else "input")
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"{backend} {name} failed: {e!r}"[:400], file=sys.stderr)
                continue
            rtfx = audio_s / wall
            results[f"{backend}_{name}"] = round(rtfx, 1)
            print(f"{backend} {name}: {wall*1e3:.2f} ms -> {rtfx:,.0f}x RT",
                  file=sys.stderr)
            if eligible and rtfx > best[1]:
                best = (f"{backend}_{name}", rtfx)
            if rtfx > best_any[1]:
                best_any = (f"{backend}_{name}", rtfx)
        del xs
        if time.perf_counter() - started > BUDGET_S and best[0]:
            break

    # ---- per-frontend TPU RTFx (NeMo batch log-mel, Kaldi fbank, VAD
    # decision fields) — diagnostics beyond the whisper-mel headline; the
    # reference publishes mel AND fbank/NeMo numbers (README.md:117-158)
    if time.perf_counter() - started < BUDGET_S:
        try:
            from melspec_tpu.config import DetectionSettings
            from melspec_tpu.ops.batch_logmel import (BatchLogMel,
                                                      BatchLogMelConfig)
            from melspec_tpu.ops.fbank import Fbank, FbankConfig
            from melspec_tpu.ops.vad import streaming_decision_fields_batched

            nemo = BatchLogMel(BatchLogMelConfig(), fft_impl="rdft")
            nemo_sig = BatchLogMel(BatchLogMelConfig(), fft_impl="sig")
            kaldi = Fbank(FbankConfig(apply_cmn=True), fft_impl="rdft")
            kaldi_sig = Fbank(FbankConfig(apply_cmn=True), fft_impl="sig")
            settings = DetectionSettings()

            from melspec_tpu.ops.mel_kernel import (whisper_mel_quantized,
                                                    whisper_mel_vad_sig)

            @jax.jit
            def vad_fields(x):
                # Sobel raw activity computed IN the sig kernel's epilogue
                # (tile-resident stencil); only the cheap window/smooth
                # prefix ops run as XLA behind it
                _, raw = whisper_mel_vad_sig(x, settings)
                return streaming_decision_fields_batched(None, settings,
                                                         raw=raw)

            batch, t = 64, 10 * SR
            xs = [jax.random.normal(k, (batch, t), dtype=jnp.float32) * 0.1
                  for k in jax.random.split(key, 3)]
            jax.block_until_ready(xs)
            audio_s = batch * t / SR
            for fname, ffn in [
                ("nemo_logmel", nemo.compute),
                ("nemo_logmel_sig", nemo_sig.compute),
                ("kaldi_fbank", kaldi.compute),
                ("kaldi_fbank_sig", kaldi_sig.compute),
                ("vad_fields", lambda x: vad_fields(x)["confidence"]),
                # fused per-frame u8 wire-record emission (q only; _bench
                # casts to f32 for the reduction — raw u8 sums can repeat
                # bit-identically and hit the remote request cache)
                ("quantized_sig",
                 lambda x: whisper_mel_quantized(x, 400, 160, 80,
                                                 16000.0)[0]),
            ]:
                # per-entry budget check: each entry can cost minutes of
                # remote compile, and the JSON line must land regardless
                if time.perf_counter() - started > BUDGET_S:
                    print("bench budget exhausted; skipping remaining "
                          "frontend rows", file=sys.stderr)
                    raise _BudgetDone
                try:
                    wall = _bench(ffn, xs, iters=8, reps=3)
                    wall, rtfx = _sanity_recheck(f"{fname}_64x10s", ffn, xs,
                                                 wall, audio_s, results)
                    results[f"{fname}_64x10s"] = round(rtfx, 1)
                    print(f"{fname} 64x10s: {wall*1e3:.2f} ms -> "
                          f"{rtfx:,.0f}x RT", file=sys.stderr)
                except Exception as e:  # noqa: BLE001
                    print(f"{fname} failed: {e!r}"[:300], file=sys.stderr)
            # ingest resampling (beyond-parity: the reference has no
            # resampler) — RTFx vs INPUT seconds. 48k->16k is the pure
            # decimation the lane-blocked matrix exists for; 44.1k->16k
            # (up=160, down=441) is the dense-rational case.
            from melspec_tpu.ops.resample import resample_poly

            for fname, up, down, in_sr in [
                ("resample_48k_16k", 1, 3, 48000),
                ("resample_44k1_16k", 160, 441, 44100),
            ]:
                if time.perf_counter() - started > BUDGET_S:
                    print("bench budget exhausted; skipping resample rows",
                          file=sys.stderr)
                    raise _BudgetDone
                rs = jax.jit(lambda x, u=up, d=down: resample_poly(x, u, d))
                rxs = [jax.random.normal(k, (64, 10 * in_sr),
                                         jnp.float32) * 0.1
                       for k in jax.random.split(jax.random.PRNGKey(up), 2)]
                jax.block_until_ready(rxs)
                try:
                    wall = _bench(rs, rxs, iters=8)
                    rtfx = 640.0 / wall
                    results[f"{fname}_64x10s"] = round(rtfx, 1)
                    print(f"{fname} 64x10s: {wall*1e3:.2f} ms -> "
                          f"{rtfx:,.0f}x RT", file=sys.stderr)
                except Exception as e:  # noqa: BLE001
                    print(f"{fname} failed: {e!r}"[:300], file=sys.stderr)
                del rxs

            # FULL composite frontend step — whisper mel + NeMo log-mel +
            # Kaldi fbank + fused VAD + 8-bit quant as ONE SPMD program
            # (parallel/sharding.sharded_frontend_step; single-device mesh
            # here — the same program the 8-device dryrun shards)
            if time.perf_counter() - started > BUDGET_S:
                print("bench budget exhausted; skipping frontend step row",
                      file=sys.stderr)
                raise _BudgetDone
            try:
                import numpy as _np
                from jax.sharding import Mesh as _Mesh

                from melspec_tpu.config import DetectionSettings
                from melspec_tpu.parallel.sharding import \
                    sharded_frontend_step

                fmesh = _Mesh(_np.asarray(jax.devices()[:1]), ("batch",))
                fstep = sharded_frontend_step(fmesh, DetectionSettings())
                fs_valid = jnp.full((batch,), t, jnp.int32)

                def _fstep_all(x):
                    out = fstep(x, fs_valid)
                    # consume ONE element of every output: the step jit
                    # is a single atomic executable, so any element
                    # depends on ALL of it completing — the chain /
                    # anti-memoization properties hold — while the old
                    # full-tensor reduce_sums added ~0.23 ms/call of
                    # device time (profiler-measured) that belonged to
                    # the harness, not the step
                    return jnp.stack([
                        out["mel"][0, 0, 0], out["nemo"][0, 0, 0],
                        out["fbank"][0, 0, 0],
                        out["mel_q8"][0, 0, 0].astype(jnp.float32),
                        out["vad_active_columns"].astype(jnp.float32)
                        .reshape(()),
                    ])

                wall = _bench(_fstep_all, xs, iters=8, reps=3)
                wall, rtfx = _sanity_recheck("frontend_step_64x10s",
                                             _fstep_all, xs, wall,
                                             audio_s, results)
                results["frontend_step_64x10s"] = round(rtfx, 1)
                print(f"frontend_step 64x10s: {wall*1e3:.2f} ms -> "
                      f"{rtfx:,.0f}x RT", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"frontend_step failed: {e!r}"[:300], file=sys.stderr)

            # whisper large-v3's 128-mel named config (WHISPER_LARGE_V3)
            # on the headline sig kernel: 128 mels is exactly one output
            # lane tile, so this width should hold the headline class
            if time.perf_counter() - started > BUDGET_S:
                print("bench budget exhausted; skipping 128-mel row",
                      file=sys.stderr)
                raise _BudgetDone
            try:
                from melspec_tpu.config import WHISPER_LARGE_V3 as _V3
                from melspec_tpu.ops.mel_kernel import whisper_mel_sig \
                    as _sig128

                f128 = lambda x: _sig128(  # noqa: E731
                    x, _V3.fft_size, _V3.hop_size, _V3.n_mels,
                    _V3.sampling_rate)
                wall = _bench(f128, xs, iters=8)
                wall, rtfx = _sanity_recheck("pallas_sig128_64x10s",
                                             f128, xs, wall, audio_s,
                                             results)
                results["pallas_sig128_64x10s"] = round(rtfx, 1)
                print(f"pallas_sig128 64x10s: {wall*1e3:.2f} ms -> "
                      f"{rtfx:,.0f}x RT", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"pallas_sig128 failed: {e!r}"[:300],
                      file=sys.stderr)

            # multistream serving at production scale (256 streams x 500
            # hops = 1,280 s of audio per dispatch — small configs are
            # dispatch-floor-bound through the tunnel and say nothing):
            # bulk (batched framing, one framed matmul pipeline) vs
            # per-hop lax.scan, plus the bf3-numerics accuracy variant.
            # Budget check BEFORE the setup: the objects and the three
            # ~250 MB device inputs below are themselves expensive.
            if time.perf_counter() - started > BUDGET_S:
                print("bench budget exhausted; skipping multistream rows",
                      file=sys.stderr)
                raise _BudgetDone
            from melspec_tpu.config import MelConfig
            from melspec_tpu.streaming.multistream import MultiStreamMel

            n_s, n_h = 256, 500
            multi = MultiStreamMel(MelConfig(400, 160, 80, 16000.0), n_s)
            multi_bf3 = MultiStreamMel(MelConfig(400, 160, 80, 16000.0),
                                       n_s, fft_impl="bf3")
            multi_sig = MultiStreamMel(MelConfig(400, 160, 80, 16000.0),
                                       n_s, fft_impl="sig")
            from melspec_tpu.streaming.serving import MultiStreamFrontend

            front = MultiStreamFrontend(MelConfig(400, 160, 80, 16000.0),
                                        n_s)
            fstate = front.init()
            active = jnp.ones(n_s, dtype=bool)
            # flat [S, H*hop] chunk layout: the serving fast path (a
            # 3D [S, H, hop] device input forces a retiling copy before
            # the signal concat — tools/resample_probe4.py)
            ms_xs = [jax.random.normal(k, (n_s, n_h * 160),
                                       jnp.float32) * 0.1
                     for k in jax.random.split(key, 3)]
            jax.block_until_ready(ms_xs)
            ms_audio = n_s * n_h * 160 / SR
            for fname, ffn in [
                ("multistream_bulk",
                 lambda x: multi._push_many_jit(multi.init(), x, active)[1]),
                ("multistream_scan",
                 lambda x: multi._push_many_scan(multi.init(), x, active)[1]),
                ("multistream_bulk_bf3",
                 lambda x: multi_bf3._push_many_jit(multi_bf3.init(), x,
                                                    active)[1]),
                # the VERDICT-r2 A/B: bulk framing through the fused sig
                # kernel vs the XLA framed-matmul path
                ("multistream_bulk_sig",
                 lambda x: multi_sig._push_many_jit(multi_sig.init(), x,
                                                    active)[1]),
                # the COMPLETE serving tick — mel + batched streaming-VAD
                # decisions + per-frame u8 quantization in one dispatch
                # (streaming/serving.py; what serve_streams.py runs)
                ("serving_tick_full",
                 lambda x: front._tick_jit(fstate, x, active)[1]
                 .astype(jnp.float32)),
            ]:
                if time.perf_counter() - started > BUDGET_S:
                    print("bench budget exhausted; skipping remaining "
                          "multistream rows", file=sys.stderr)
                    break
                try:
                    wall = _bench(ffn, ms_xs, iters=8)
                    wall, rtfx = _sanity_recheck(
                        f"{fname}_{n_s}sx{n_h}h", ffn, ms_xs, wall,
                        ms_audio, results)
                    results[f"{fname}_{n_s}sx{n_h}h"] = round(rtfx, 1)
                    print(f"{fname} {n_s}sx{n_h}h: {wall*1e3:.2f} ms -> "
                          f"{rtfx:,.0f}x RT", file=sys.stderr)
                except Exception as e:  # noqa: BLE001
                    print(f"{fname} failed: {e!r}"[:300], file=sys.stderr)
            del ms_xs
            # route-calibration evidence (VERDICT r3 item 5): run the
            # startup A/B at the serving shape and print its pick next to
            # this session's own bulk-route rows, so every BENCH session
            # records whether the calibrated pick matches the in-session
            # winner. The calibration times the FULL tick; the A/B rows
            # above time the bare bulk push — stderr shows both.
            if time.perf_counter() - started > BUDGET_S:
                print("bench budget exhausted; skipping calibration row",
                      file=sys.stderr)
                raise _BudgetDone
            try:
                from melspec_tpu.streaming.serving import calibrate_fft_impl

                pick = calibrate_fft_impl(MelConfig(400, 160, 80, 16000.0),
                                          n_s, n_h)
                a = results.get(f"multistream_bulk_{n_s}sx{n_h}h")
                b = results.get(f"multistream_bulk_sig_{n_s}sx{n_h}h")
                results["calibrated_pick_is_sig"] = float(pick == "sig")
                if a and b:
                    winner = "rdft" if a >= b else "sig"
                    agree = ("MATCH" if winner == pick
                             else "tick ranks differently than bare push")
                    print(f"calibrated route pick: {pick} (session bulk "
                          f"A/B winner: {winner} — {agree})",
                          file=sys.stderr)
                else:
                    print(f"calibrated route pick: {pick}", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"calibration row failed: {e!r}"[:300],
                      file=sys.stderr)
            # source-rate serving tick: 48 kHz clients, resample + mel +
            # VAD + quant in ONE dispatch (SourceRateFrontend). Audio
            # seconds are identical to serving_tick_full (1,280 s), so
            # the delta vs that row IS the on-device resampling cost.
            if time.perf_counter() - started > BUDGET_S:
                print("bench budget exhausted; skipping source-rate tick",
                      file=sys.stderr)
                raise _BudgetDone
            from melspec_tpu.streaming.serving import SourceRateFrontend

            sfront = SourceRateFrontend(MelConfig(400, 160, 80, 16000.0),
                                        n_s, input_rate=48000)
            sfstate = sfront.init()
            src_xs = [jax.random.normal(k, (n_s, n_h * sfront.hop_src),
                                        jnp.float32) * 0.1
                      for k in jax.random.split(jax.random.PRNGKey(9), 2)]
            jax.block_until_ready(src_xs)
            try:
                src_fn = lambda x: sfront._tick_jit(sfstate, x, active)[1] \
                    .astype(jnp.float32)  # noqa: E731
                wall = _bench(src_fn, src_xs, iters=8)
                wall, rtfx = _sanity_recheck(
                    f"serving_tick_src48_{n_s}sx{n_h}h", src_fn, src_xs,
                    wall, ms_audio, results)
                results[f"serving_tick_src48_{n_s}sx{n_h}h"] = round(rtfx, 1)
                print(f"serving_tick_src48 {n_s}sx{n_h}h: {wall*1e3:.2f} ms"
                      f" -> {rtfx:,.0f}x RT", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"serving_tick_src48 failed: {e!r}"[:300],
                      file=sys.stderr)
        except _BudgetDone:
            pass
        except Exception as e:  # noqa: BLE001
            print(f"frontend bench setup failed: {e!r}"[:300],
                  file=sys.stderr)

    if best[0] is None:
        print(json.dumps({"metric": "whisper_mel_rtfx", "value": 0,
                          "unit": "x_realtime", "vs_baseline": 0,
                          "error": "all backends failed"}))
        return

    print(f"per-config results: {results}", file=sys.stderr)
    print(f"best overall (incl. accuracy-ineligible): {best_any}",
          file=sys.stderr)
    print(json.dumps(_headline(best, tpu_gate)))


def _headline(best, tpu_gate: str) -> dict:
    """The one published JSON row. BINDING gate: a timing headline whose
    numerics the compiled golden gates reject must never be published —
    enforced here (gate 'fail'/'error' zeroes the headline), not merely
    annotated. 'skipped' only happens off-TPU, where the bench is not an
    official run anyway and the CPU path is test-gated in CI.
    Tested by tests/test_bench_gate.py."""
    if tpu_gate not in ("pass", "skipped"):
        print(f"compiled gate {tpu_gate!r}: refusing to publish the "
              f"candidate headline {best}", file=sys.stderr)
        return {
            "metric": "whisper_mel_rtfx_1chip[gate_failed]",
            "value": 0, "unit": "x_realtime", "vs_baseline": 0,
            "tpu_compiled_gate": tpu_gate,
            "error": "compiled-mode golden gate did not pass; timing "
                     "headline withheld",
        }
    return {
        "metric": f"whisper_mel_rtfx_1chip[{best[0]}|par<=1e-5]",
        "value": round(best[1], 1),
        "unit": "x_realtime",
        "vs_baseline": round(best[1] / BASELINE_RTFX, 1),
        "tpu_compiled_gate": tpu_gate,
    }


if __name__ == "__main__":
    main()
