"""Example applications smoke tests (subprocess, CPU platform) — pins the
CLI surface the way the reference pins its examples via readme tests."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
REF = REPO / "testdata"


def run(args, timeout=600):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, capture_output=True, text=True,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def pcm_file(tmp_path_factory):
    if not REF.is_dir():
        pytest.skip("reference testdata unavailable")
    from melspec_tpu.io.wav import read_wav_f32le

    path = tmp_path_factory.mktemp("pcm") / "jfk.f32le"
    path.write_bytes(read_wav_f32le(REF / "jfk_f32le.wav")[:64000].tobytes())
    return path


def test_mel_tga_and_tga_to_asr(pcm_file, tmp_path):
    out_dir = tmp_path / "mels"
    with open(pcm_file, "rb") as fh:
        proc = subprocess.run(
            [sys.executable, "examples/mel_tga.py", "--platform", "cpu",
             "--out-dir", str(out_dir)],
            cwd=REPO, stdin=fh, capture_output=True, text=True, timeout=600,
        )
    assert proc.returncode == 0, proc.stderr[-500:]
    tgas = sorted(out_dir.glob("*.tga"))
    assert tgas

    proc = run(["examples/tga_to_asr.py", str(tgas[0]),
                "--out", str(tmp_path / "feats.npz")])
    assert proc.returncode == 0, proc.stderr[-500:]
    z = np.load(tmp_path / "feats.npz")
    assert z["input_features"].shape[1] == 80


def test_waterfall(tmp_path):
    if not REF.is_dir():
        pytest.skip("reference testdata unavailable")
    out = tmp_path / "wf.png"
    proc = run(["examples/waterfall.py", str(REF / "jfk_f32le.wav"),
                "--out", str(out), "--platform", "cpu"])
    assert proc.returncode == 0, proc.stderr[-500:]
    assert out.stat().st_size > 1000


def test_vad_ten_eval_cli():
    if not (REF / "ten-vad").is_dir():
        pytest.skip("ten-vad testset unavailable")
    proc = run(["examples/vad_ten_eval.py", "--platform", "cpu",
                "--max-files", "2"])
    assert proc.returncode == 0, proc.stderr[-500:]
    assert "macro:" in proc.stdout and "rtfx" in proc.stdout


def test_stream_asr_segments(pcm_file, tmp_path):
    with open(pcm_file, "rb") as fh:
        proc = subprocess.run(
            [sys.executable, "examples/stream_asr_segments.py",
             "--platform", "cpu", "--out-dir", str(tmp_path)],
            cwd=REPO, stdin=fh, capture_output=True, text=True, timeout=600,
        )
    assert proc.returncode == 0, proc.stderr[-500:]


def test_serve_streams_16_concurrent(testdata):
    """VERDICT item 9: >=16 concurrent PCM streams through the socket
    serving loop (MultiStreamMel bulk push + VAD + 8-bit quantization),
    each stream's dequantized mel matching the single-stream reference."""
    import importlib.util
    import threading

    from melspec_tpu.config import MelConfig
    from melspec_tpu.io.wav import read_wav_f32le
    from melspec_tpu.ops.quant import QuantizationRange, dequantize, quantize
    from melspec_tpu.ops.spectrogram import compute_streaming_mel

    spec = importlib.util.spec_from_file_location(
        "serve_streams", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    pcm = read_wav_f32le(REF / "jfk_f32le.wav")
    n_streams = 16
    server = serve.StreamServer(port=0, n_streams=n_streams,
                                config=MelConfig(400, 160, 80, 16000.0))
    server.start()
    try:
        clips = [pcm[i * 2000 : i * 2000 + 48000] for i in range(n_streams)]
        results = [None] * n_streams

        def go(i):
            results[i] = serve.stream_client(server.port, clips[i])

        threads = [threading.Thread(target=go, args=(i,))
                   for i in range(n_streams)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i in range(n_streams):
            recs = results[i]
            assert recs is not None and len(recs) > 0, f"stream {i} empty"
            # expected frame count: streaming semantics over 48000 samples
            from melspec_tpu.ops import framing

            assert len(recs) == framing.num_frames_streaming(48000, 400, 160)
            # frame indices are the stream's own counter, in order
            assert [r[0] for r in recs] == list(range(len(recs)))
            # dequantized mel matches the single-stream reference pipeline
            # to quantization resolution
            want = compute_streaming_mel(clips[i], 400, 160, 80, 16000.0)
            got = np.stack([
                dequantize(r[4], QuantizationRange(r[2], r[3]))
                for r in recs
            ]).T
            assert got.shape == want.shape
            step = (want.max() - want.min()) / 255.0
            assert np.abs(got - want).max() <= step * 1.5 + 1e-4
        # speech must trigger voice activity on at least some streams
        assert any(any(r[1] for r in results[i]) for i in range(n_streams))
    finally:
        server.stop()


def test_serve_streams_input_rate_resampling(testdata):
    """``input_rate``: a 48 kHz client is resampled at ingest (polyphase,
    scipy-parity, zero-extended tail flushed before EOF) and served
    identically to a 16 kHz client sending the resampled audio."""
    import importlib.util

    from melspec_tpu.config import MelConfig
    from melspec_tpu.io.wav import read_wav_f32le
    from melspec_tpu.ops import framing
    from melspec_tpu.ops.quant import QuantizationRange, dequantize
    from melspec_tpu.ops.resample import resample_output_len, resample_poly
    from melspec_tpu.ops.spectrogram import compute_streaming_mel

    spec = importlib.util.spec_from_file_location(
        "serve_streams_rs", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    pcm16 = read_wav_f32le(REF / "jfk_f32le.wav")[:32000]
    pcm48 = np.asarray(resample_poly(pcm16, 3, 1)).astype(np.float32)
    back16 = np.asarray(resample_poly(pcm48, 1, 3)).astype(np.float32)
    server = serve.StreamServer(port=0, n_streams=2,
                                config=MelConfig(400, 160, 80, 16000.0),
                                input_rate=48000)
    server.start()
    try:
        recs = serve.stream_client(server.port, pcm48)
    finally:
        server.stop()
    n16 = resample_output_len(len(pcm48), 1, 3)
    assert n16 == len(back16)
    assert len(recs) == framing.num_frames_streaming(n16, 400, 160)
    assert [r[0] for r in recs] == list(range(len(recs)))
    want = np.asarray(compute_streaming_mel(back16, 400, 160, 80, 16000.0))
    got = np.stack([
        dequantize(r[4], QuantizationRange(r[2], r[3])) for r in recs
    ]).T
    assert got.shape == want.shape
    # per-frame quantization step + the f32-vs-f64 ingest-resampler jitter
    step = (want.max() - want.min()) / 255.0
    assert np.abs(got - want).max() <= step * 1.5 + 1e-3
    assert any(r[1] for r in recs)  # speech still triggers VAD


def test_serve_streams_device_resample(testdata):
    """``--device-resample``: the tick is a SourceRateFrontend (resample +
    mel + VAD + quant in ONE dispatch, rings hold 48 kHz samples). The
    records match the host-resampled reference mel frame-for-frame — the
    resampler's hop-aligned warm-up shifts the grid by exactly
    spurious_out/hop hops, so record j still equals reference frame j;
    only the tail differs (no EOF zero-extension flush on device;
    leftover source samples below one hop are dropped, like the host
    path's sub-hop leftover)."""
    import importlib.util

    from melspec_tpu.config import MelConfig
    from melspec_tpu.io.wav import read_wav_f32le
    from melspec_tpu.ops.quant import QuantizationRange, dequantize
    from melspec_tpu.ops.resample import resample_poly
    from melspec_tpu.ops.spectrogram import compute_streaming_mel

    spec = importlib.util.spec_from_file_location(
        "serve_streams_dr", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    pcm16 = read_wav_f32le(REF / "jfk_f32le.wav")[:32000]
    pcm48 = np.asarray(resample_poly(pcm16, 3, 1)).astype(np.float32)
    back16 = np.asarray(resample_poly(pcm48, 1, 3)).astype(np.float32)
    server = serve.StreamServer(port=0, n_streams=2,
                                config=MelConfig(400, 160, 80, 16000.0),
                                input_rate=48000, device_resample=True)
    assert server.ingest_hop == 480
    server.start()
    try:
        recs = serve.stream_client(server.port, pcm48)
    finally:
        server.stop()
    k = len(pcm48) // 480          # full source hops the ring can drain
    spur_hops = server.frontend.rs.spurious_out // 160
    # frames: k output hops, validity delayed by spur_hops extra hops
    assert len(recs) == (k - 2) - spur_hops
    assert [r[0] for r in recs] == list(range(len(recs)))
    want = np.asarray(
        compute_streaming_mel(back16[: k * 160], 400, 160, 80, 16000.0))
    got = np.stack([
        dequantize(r[4], QuantizationRange(r[2], r[3])) for r in recs
    ]).T
    # record j == reference frame j (the warm-up shift cancels in the
    # index); the device path just stops spur_hops frames earlier
    assert got.shape == (80, want.shape[1] - spur_hops)
    step = (want.max() - want.min()) / 255.0
    assert np.abs(got - want[:, : got.shape[1]]).max() <= step * 1.5 + 1e-3
    assert any(r[1] for r in recs)  # speech still triggers VAD


def test_serve_streams_s16le_ingest(testdata):
    """``--pcm-format s16le`` (telephony/gateway fleets): an int16 client's
    records are BYTE-IDENTICAL to an f32 client sending the decoded
    samples — the decode (x / 32768) is exact in f32, everything past the
    recv boundary is shared."""
    import importlib.util

    from melspec_tpu.config import MelConfig
    from melspec_tpu.io.wav import read_wav_f32le

    spec = importlib.util.spec_from_file_location(
        "serve_streams_s16", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    pcm = read_wav_f32le(REF / "jfk_f32le.wav")[:32000]
    s16 = np.clip(np.round(pcm * 32768.0), -32768, 32767).astype(np.int16)
    dec = s16.astype(np.float32) / 32768.0

    srv16 = serve.StreamServer(port=0, n_streams=2,
                               config=MelConfig(400, 160, 80, 16000.0),
                               pcm_format="s16le")
    srv16.start()
    try:
        # odd chunk size: int16 samples split across TCP sends must be
        # reassembled by the recv loop's leftover handling
        recs16 = serve.stream_client(srv16.port, pcm, chunk=4093,
                                     pcm_format="s16le")
    finally:
        srv16.stop()
    srv32 = serve.StreamServer(port=0, n_streams=2,
                               config=MelConfig(400, 160, 80, 16000.0))
    srv32.start()
    try:
        recs32 = serve.stream_client(srv32.port, dec)
    finally:
        srv32.stop()
    assert len(recs16) == len(recs32) > 0
    for a, b in zip(recs16, recs32):
        assert a[:4] == b[:4]
        assert np.array_equal(a[4], b[4])
    with pytest.raises(ValueError, match="pcm_format"):
        serve.StreamServer(port=0, n_streams=2, pcm_format="u8")


def test_serve_streams_slot_churn_resets_state(testdata):
    """Regression for the zero-copy reset race: the tick used to clear
    the shared `_pending_reset` numpy array in place after handing it to
    the async jitted reset, so a reused slot could inherit the previous
    stream's warm-up counter and VAD history once the jit cache was warm
    (fast ticks). Churn one slot with sequential clients: every client
    must get exactly the fresh-stream frame count, with the warm-up
    frames absent and record indices restarting at 0."""
    import importlib.util

    from melspec_tpu.config import MelConfig
    from melspec_tpu.io.wav import read_wav_f32le
    from melspec_tpu.ops import framing

    spec = importlib.util.spec_from_file_location(
        "serve_streams_churn", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    pcm = read_wav_f32le(REF / "jfk_f32le.wav")[:24000]
    n = framing.num_frames_streaming(24000, 400, 160)
    server = serve.StreamServer(port=0, n_streams=1)
    server.start()
    try:
        first = None
        for k in range(6):
            recs = serve.stream_client(server.port, pcm)
            # a stale warm-up counter yields EXTRA leading frames; a
            # stale VAD history flips the first decisions
            assert len(recs) == n, f"client {k}: {len(recs)} != {n}"
            assert [r[0] for r in recs] == list(range(n))
            got = [(r[1], r[2], r[3], r[4].tobytes()) for r in recs]
            if first is None:
                first = got
            else:
                assert got == first, f"client {k} diverged from client 0"
    finally:
        server.stop()


def test_serve_streams_s16_8k_telephony_combo(testdata):
    """``--pcm-format s16le --input-rate 8000`` together (the TCP
    telephony shape): the recv loop decodes int16 THEN feeds the host
    resampler. Records match a plain 16 kHz f32 server fed the
    host-resampled decoded audio, within one quantization step (the
    streaming-vs-offline resampler ulp class, as in the ws combo test)."""
    import importlib.util

    from melspec_tpu.config import MelConfig
    from melspec_tpu.io.wav import read_wav_f32le
    from melspec_tpu.ops.quant import QuantizationRange, dequantize
    from melspec_tpu.ops.resample import resample_poly

    spec = importlib.util.spec_from_file_location(
        "serve_streams_tel", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    x16 = read_wav_f32le(REF / "jfk_f32le.wav")[:32000]
    x8 = np.asarray(resample_poly(x16, 1, 2)).astype(np.float32)
    s16 = np.clip(np.round(x8 * 32768.0), -32768, 32767).astype(np.int16)
    dec8 = s16.astype(np.float32) / 32768.0
    back16 = np.asarray(resample_poly(dec8, 2, 1)).astype(np.float32)

    srv = serve.StreamServer(port=0, n_streams=2,
                             config=MelConfig(400, 160, 80, 16000.0),
                             pcm_format="s16le", input_rate=8000)
    srv.start()
    try:
        recs = serve.stream_client(srv.port, dec8, chunk=4093,
                                   pcm_format="s16le")
    finally:
        srv.stop()
    ref_srv = serve.StreamServer(port=0, n_streams=2,
                                 config=MelConfig(400, 160, 80, 16000.0))
    ref_srv.start()
    try:
        want = serve.stream_client(ref_srv.port, back16)
    finally:
        ref_srv.stop()
    assert len(recs) == len(want) > 0
    assert [r[0] for r in recs] == [r[0] for r in want]
    va_flips = sum(a[1] != b[1] for a, b in zip(recs, want))
    assert va_flips <= max(2, len(recs) // 50)
    mel_a = np.stack([dequantize(r[4], QuantizationRange(r[2], r[3]))
                      for r in recs])
    mel_b = np.stack([dequantize(r[4], QuantizationRange(r[2], r[3]))
                      for r in want])
    step = (mel_b.max() - mel_b.min()) / 255.0
    assert np.abs(mel_a - mel_b).max() <= 2 * step + 1e-3


def test_pack_records_batch_matches_struct_loop():
    """The vectorized whole-tick record packer must be byte-identical to
    the per-record struct.pack formulation, for arbitrary valid masks
    and per-stream frame counters."""
    import importlib.util
    import struct

    spec = importlib.util.spec_from_file_location(
        "serve_streams_pack", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    rng = np.random.default_rng(5)
    for s, h, n_mels in [(1, 1, 80), (3, 4, 80), (16, 7, 128), (5, 1, 3)]:
        q = rng.integers(0, 256, (s, h, n_mels)).astype(np.uint8)
        lo = rng.normal(size=(s, h)).astype(np.float32)
        hi = (lo + 1).astype(np.float32)
        va = rng.integers(0, 2, (s, h)).astype(bool)
        mask = rng.integers(0, 2, (s, h)).astype(bool)
        fidx0 = rng.integers(0, 1 << 20, s).astype(np.int64)

        want = bytearray()
        want_counts = []
        for i in range(s):
            fidx, m = int(fidx0[i]), 0
            for j in range(h):
                if not mask[i, j]:
                    continue
                want += struct.pack("<IBff", fidx, int(va[i, j]),
                                    float(lo[i, j]), float(hi[i, j]))
                want += q[i, j].tobytes()
                fidx += 1
                m += 1
            want_counts.append(m)
        got, counts = serve.pack_records_batch(fidx0, q, lo, hi, va, mask)
        assert got == bytes(want), (s, h, n_mels)
        assert counts.tolist() == want_counts
    # empty mask: no bytes, zero counts
    got, counts = serve.pack_records_batch(
        np.zeros(2, np.int64), q[:2], lo[:2], hi[:2], va[:2],
        np.zeros((2, h), bool))
    assert got == b"" and counts.tolist() == [0, 0]


def test_serve_streams_idle_timeout_frees_slot(testdata):
    """A connected-but-silent client must not hold its slot forever:
    after ``idle_timeout_s`` the server closes it (counting it in
    stats) and the freed slot serves the next client normally."""
    import importlib.util
    import socket
    import time

    from melspec_tpu.io.wav import read_wav_f32le
    from melspec_tpu.ops import framing

    spec = importlib.util.spec_from_file_location(
        "serve_streams_idle", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    pcm = read_wav_f32le(REF / "jfk_f32le.wav")[:24000]
    server = serve.StreamServer(port=0, n_streams=1, idle_timeout_s=0.4)
    server.start()
    try:
        silent = socket.create_connection(("127.0.0.1", server.port),
                                          timeout=30)
        silent.sendall(pcm[:800].tobytes())  # 5 hops, then go silent
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            s = server.stats()
            if s["idle_timeouts"] == 1 and s["in_use"] == 0:
                break
            time.sleep(0.02)
        assert s["idle_timeouts"] == 1 and s["in_use"] == 0, s
        silent.close()
        # the single slot is free again: a real client streams through
        recs = serve.stream_client(server.port, pcm)
        assert len(recs) == framing.num_frames_streaming(24000, 400, 160)
        assert [r[0] for r in recs] == list(range(len(recs)))
    finally:
        server.stop()


def test_serve_streams_stalled_reader_cannot_freeze_fleet(testdata):
    """A client that streams PCM but never reads its replies fills the
    server's send buffer; sendall used to block the tick thread forever
    (freezing EVERY stream and the idle-eviction mechanism itself). With
    the per-socket send timeout the stalled client is killed and other
    clients keep being served."""
    import importlib.util
    import socket
    import time

    from melspec_tpu.io.wav import read_wav_f32le
    from melspec_tpu.ops import framing

    spec = importlib.util.spec_from_file_location(
        "serve_streams_stall", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    pcm = read_wav_f32le(REF / "jfk_f32le.wav")
    long_pcm = np.tile(pcm, 3)  # ~33 s -> ~3300 records = ~300 KB
    # bounded SO_SNDBUF: loopback autotuning would otherwise buffer all
    # ~300 KB of records and the send would never stall
    server = serve.StreamServer(port=0, n_streams=2, send_timeout_s=0.5,
                                send_buffer_bytes=8192)
    server.start()
    try:
        stalled = socket.socket()
        # a tiny receive window makes the server's send side fill fast
        stalled.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 2048)
        stalled.connect(("127.0.0.1", server.port))
        stalled.sendall(long_pcm.tobytes())  # stream, never read replies
        # the stalled client must get evicted (send timeout), freeing
        # its slot, while the server remains responsive throughout
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if server.stats()["clients_served"] >= 1 \
                    and server.stats()["in_use"] == 0:
                break
            time.sleep(0.05)
        assert server.stats()["in_use"] == 0, server.stats()
        stalled.close()
        # a well-behaved client is served normally afterwards
        recs = serve.stream_client(server.port, pcm[:32000])
        assert len(recs) == framing.num_frames_streaming(32000, 400, 160)
    finally:
        server.stop()


def test_serve_streams_stop_closes_live_connections(testdata):
    """stop() must send a FIN to surviving clients — without it a client
    blocked in recv() waits out its own (long) timeout."""
    import importlib.util
    import socket
    import time

    spec = importlib.util.spec_from_file_location(
        "serve_streams_stopfin", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    server = serve.StreamServer(port=0, n_streams=2)
    server.start()
    c = socket.create_connection(("127.0.0.1", server.port), timeout=30)
    c.sendall(np.zeros(1600, np.float32).tobytes())  # mid-stream, no EOF
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline and not server.stats()["in_use"]:
        time.sleep(0.01)
    server.stop()
    c.settimeout(10)
    # drain whatever was sent, then expect EOF promptly (not a timeout)
    try:
        while c.recv(65536):
            pass
        eof = True
    except TimeoutError:
        eof = False
    c.close()
    assert eof, "server.stop() left the client connection open"


def test_serve_streams_device_resample_requires_input_rate():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "serve_streams_dr", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)
    with pytest.raises(ValueError, match="requires --input-rate"):
        serve.StreamServer(port=0, n_streams=2, device_resample=True)
    # 16 kHz input explicitly declared: no resampler needed, plain tick
    srv = serve.StreamServer(port=0, n_streams=2, device_resample=True,
                             input_rate=16000)
    srv.stop()


def test_serve_streams_graceful_drain(testdata):
    """``stop(drain=True)``: in-flight half-closed streams finish — the
    client receives every record — before the server halts."""
    import importlib.util
    import threading
    import time

    from melspec_tpu.io.wav import read_wav_f32le
    from melspec_tpu.ops import framing

    spec = importlib.util.spec_from_file_location(
        "serve_streams_drain", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    pcm = read_wav_f32le(REF / "jfk_f32le.wav")[:48000]
    server = serve.StreamServer(port=0, n_streams=2)
    server.start()
    result = {}

    def go():
        result["recs"] = serve.stream_client(server.port, pcm)

    t = threading.Thread(target=go)
    t.start()
    # wait until the stream is actually in flight, then drain-stop
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if server.stats()["in_use"] or "recs" in result:
            break
        time.sleep(0.005)
    server.stop(drain=True, timeout=120)
    t.join(timeout=120)
    assert not t.is_alive()
    n = framing.num_frames_streaming(48000, 400, 160)
    assert len(result["recs"]) == n, len(result["recs"])


def test_serve_streams_stats(testdata):
    """``stats()``: the observability snapshot a deployment scrapes —
    counters must reflect the streams actually served."""
    import importlib.util

    from melspec_tpu.io.wav import read_wav_f32le
    from melspec_tpu.ops import framing

    spec = importlib.util.spec_from_file_location(
        "serve_streams_stats", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    pcm = read_wav_f32le(REF / "jfk_f32le.wav")[:32000]
    server = serve.StreamServer(port=0, n_streams=4)
    server.start()
    try:
        s0 = server.stats()
        assert s0 == {"n_streams": 4, "in_use": 0, "ticks": 0,
                      "frames_sent": 0, "clients_served": 0,
                      "idle_timeouts": 0, "slots": []}
        # live-slot snapshot: keep a connection open mid-stream (the
        # per-slot fields — frames/ring/ring_dropped/eof — are only
        # reachable with a slot in use; a stats() crash here used to
        # kill the whole server via the daemon-thread main loop)
        import socket as _socket
        import time as _time

        live = _socket.create_connection(("127.0.0.1", server.port),
                                         timeout=30)
        live.sendall(pcm[:8000].tobytes())
        deadline = _time.monotonic() + 60
        while _time.monotonic() < deadline:
            s_live = server.stats()
            if s_live["in_use"] == 1 and s_live["slots"]:
                break
            _time.sleep(0.01)
        assert s_live["in_use"] == 1
        (slot,) = s_live["slots"]
        assert slot["ring_dropped"] == 0 and not slot["eof"]
        live.shutdown(_socket.SHUT_WR)
        while live.recv(65536):
            pass
        live.close()

        recs1 = serve.stream_client(server.port, pcm)
        recs2 = serve.stream_client(server.port, pcm)
        s = server.stats()
    finally:
        server.stop()
    n = framing.num_frames_streaming(32000, 400, 160)
    n_live = framing.num_frames_streaming(8000, 400, 160)
    assert len(recs1) == len(recs2) == n
    assert s["frames_sent"] == 2 * n + n_live
    assert s["clients_served"] == 3
    assert s["in_use"] == 0 and s["slots"] == []
    assert s["ticks"] >= 3


def test_asr_handoff_from_tga(tmp_path, testdata):
    """VERDICT item 7: exercise the ASR handoff for real — TGA features in,
    Whisper decode out. No checkpoint weights exist in this offline
    environment, so the model is a SEEDED tiny WhisperForConditional-
    Generation (real transformers architecture, deterministic init): the
    test proves the full set_mel mechanism — our TGA-stored, whisper-
    normalized mel is consumed as `input_features`, the encoder/decoder
    stack runs, and generation produces tokens that depend on the audio
    content (two different clips -> different token streams)."""
    import importlib.util

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    from melspec_tpu.io.tga import load_tga_8bit, save_tga_8bit, to_array2
    from melspec_tpu.io.wav import read_wav_f32le
    from melspec_tpu.ops.spectrogram import compute_streaming_mel
    from melspec_tpu.io.tga import interleave_frames

    spec = importlib.util.spec_from_file_location(
        "tga_to_asr", REPO / "examples" / "tga_to_asr.py"
    )
    asr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(asr)

    # features -> TGA -> reload (the reference's checkpoint/resume story)
    pcm = read_wav_f32le(REF / "jfk_f32le.wav")
    mels = {}
    for name, clip in (("a", pcm[:48000]), ("b", pcm[48000:96000])):
        mel = compute_streaming_mel(clip, 400, 160, 80, 16000.0)
        path = tmp_path / f"{name}.tga"
        save_tga_8bit(interleave_frames([mel]), 80, path)
        mels[name] = to_array2(load_tga_8bit(path), 80).astype(np.float32)

    torch.manual_seed(0)
    config = WhisperConfig(
        vocab_size=64, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=1500, max_target_positions=64,
        decoder_start_token_id=1, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    model = WhisperForConditionalGeneration(config).eval()

    feats_a = asr.whisper_features(mels["a"])
    assert feats_a.shape == (1, 80, 3000)

    ids_a = asr.transcribe(mels["a"], model, max_new_tokens=12)
    ids_a2 = asr.transcribe(mels["a"], model, max_new_tokens=12)
    assert ids_a.shape[1] > 1              # decoding loop actually ran
    np.testing.assert_array_equal(ids_a, ids_a2)  # deterministic

    # mel-dependence at the logits level (a random model's greedy argmax
    # can saturate to one token, but the encoder MUST see the audio):
    dec = torch.tensor([[1]])
    with torch.no_grad():
        la = model(input_features=torch.from_numpy(asr.whisper_features(
            mels["a"])), decoder_input_ids=dec).logits
        lb = model(input_features=torch.from_numpy(asr.whisper_features(
            mels["b"])), decoder_input_ids=dec).logits
    assert torch.isfinite(la).all() and torch.isfinite(lb).all()
    assert not torch.allclose(la, lb), "logits must depend on the mel"


def test_idle_evicted_client_still_receives_buffered_records(testdata):
    """Idle eviction half-closes only the READ side: records for audio
    already buffered in the slot's ring at timeout must still drain and
    be DELIVERED (ending in a clean FIN), not discarded with the
    connection. Regression for the SHUT_RDWR eviction that destroyed the
    reply direction."""
    import importlib.util
    import socket
    import time

    from melspec_tpu.io.wav import read_wav_f32le
    from melspec_tpu.ops import framing

    spec = importlib.util.spec_from_file_location(
        "serve_streams_evict", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    n_samples = 16000  # 100 hops in one burst
    pcm = read_wav_f32le(REF / "jfk_f32le.wav")[:n_samples]
    # hops_per_tick=1 so the backlog drains one hop per tick: the idle
    # timeout fires while most of the burst still sits in the ring
    server = serve.StreamServer(port=0, n_streams=1, hops_per_tick=1,
                                idle_timeout_s=0.05)
    server.start()
    try:
        conn = socket.create_connection(("127.0.0.1", server.port),
                                        timeout=120)
        conn.sendall(pcm.astype("<f4").tobytes())
        # go silent WITHOUT half-closing: only the idle timeout ends this
        buf = b""
        while True:
            try:
                data = conn.recv(65536)
            except OSError:
                break
            if not data:
                break  # server FIN after the drain — the clean ending
            buf += data
        conn.close()
        assert server.stats()["idle_timeouts"] == 1
        rec_size = serve.HEADER.size + 80
        assert len(buf) % rec_size == 0
        got = len(buf) // rec_size
        # every full hop buffered before the timeout produces a record
        assert got == framing.num_frames_streaming(n_samples, 400, 160)
        idx0 = serve.HEADER.unpack(buf[: serve.HEADER.size])[0]
        assert idx0 == 0
    finally:
        server.stop()


def test_serve_streams_fft_impl_auto_and_validation(testdata):
    """--fft-impl auto (VERDICT r3 item 5): on a CPU backend the
    calibration falls back to 'rdft' without timing (the sig route would
    run interpret-mode), the resolved route is recorded, equal-config
    servers share ONE canonical frontend instance (so the calibration's
    probe compiles are the serving compiles), and the served records
    match a plain rdft server's."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "serve_streams_auto", REPO / "examples" / "serve_streams.py"
    )
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    with pytest.raises(ValueError, match="fft_impl"):
        serve.StreamServer(port=0, n_streams=2, fft_impl="nope")

    srv = serve.StreamServer(port=0, n_streams=2, fft_impl="auto")
    try:
        assert srv.fft_impl == "rdft"  # CPU fallback, no timing run
        srv2 = serve.StreamServer(port=0, n_streams=2, fft_impl="rdft")
        try:
            # config-keyed sharing: same canonical frontend object
            assert srv2.frontend is srv.frontend
        finally:
            srv2.stop()
        srv.start()
        from melspec_tpu.io.wav import read_wav_f32le

        pcm = read_wav_f32le(REF / "jfk_f32le.wav")[:16000]
        recs = serve.stream_client(srv.port, pcm)
        from melspec_tpu.ops import framing

        assert len(recs) == framing.num_frames_streaming(16000, 400, 160)
    finally:
        srv.stop()


def test_calibrate_fft_impl_fallbacks():
    """calibrate_fft_impl resolves WITHOUT timing whenever the sig route
    cannot serve the config."""
    from melspec_tpu.config import MelConfig
    from melspec_tpu.streaming.serving import calibrate_fft_impl

    # CPU backend: rdft, immediately
    assert calibrate_fft_impl(n_streams=2, hops=2) == "rdft"
    # log10 records: the sig kernel normalizes in-kernel
    assert calibrate_fft_impl(record_norm="log10") == "rdft"
    # no macro-row geometry for a hop this small
    assert calibrate_fft_impl(MelConfig(16, 4, 8, 16000.0)) == "rdft"
