// Live mel waterfall client.
//
// Wire record from the bridge (little-endian, one per emitted frame):
//   u32 frame_idx | u8 va | f32 min | f32 max | u8[nMels] quantized
// The payload is the whisper-normalized mel column quantized to 8 bits
// over [min, max] (see examples/serve_streams.py's protocol note) — the
// min/max header makes each record self-describing, so columns are
// DEQUANTIZED and rendered on a fixed display range (per-column
// auto-gain would paint silence as full-brightness noise).

const N_MELS = 80;
const REC_SIZE = 4 + 1 + 4 + 4 + N_MELS;
const SAMPLE_RATE = 16000;
// fixed display range for whisper-normalized mel: loud speech peaks near
// (max+4)/4 ~ 1; silence sits far below the lower edge and renders dark
const VIEW_LO = -1.0, VIEW_HI = 1.0;

// Small perceptual colormap (dark -> bright), two variants like the
// reference's cividis/plasma switch on VAD: stops are (r,g,b) anchors
// lerped in u8 space.
const CALM = [[0, 0, 32], [32, 48, 96], [64, 112, 128], [160, 192, 96],
              [255, 240, 64]];
const VOICED = [[16, 0, 48], [96, 16, 112], [192, 48, 96], [240, 128, 48],
                [255, 232, 96]];

function colorize(v, stops) {
  const x = Math.min(Math.max(v, 0), 0.999) * (stops.length - 1);
  const i = Math.floor(x), f = x - i;
  const a = stops[i], b = stops[i + 1];
  return [0, 1, 2].map((c) => Math.round(a[c] + f * (b[c] - a[c])));
}

const canvas = document.getElementById("canvas");
const ctx = canvas.getContext("2d");
ctx.fillStyle = "#000";
ctx.fillRect(0, 0, canvas.width, canvas.height);

function drawColumn(bytes, lo, hi, va) {
  // scroll left one column
  ctx.globalCompositeOperation = "copy";
  ctx.drawImage(canvas, 1, 0, canvas.width - 1, canvas.height,
                0, 0, canvas.width - 1, canvas.height);
  ctx.globalCompositeOperation = "source-over";

  const img = ctx.createImageData(1, N_MELS);
  const stops = va ? VOICED : CALM;
  const scale = (hi - lo) / 255;
  for (let m = 0; m < N_MELS; m++) {
    const v = lo + bytes[m] * scale;                 // dequantize
    const v01 = (v - VIEW_LO) / (VIEW_HI - VIEW_LO); // fixed range
    const [r, g, b] = colorize(v01, stops);
    const o = (N_MELS - 1 - m) * 4; // mel 0 at the bottom
    img.data[o] = r; img.data[o + 1] = g; img.data[o + 2] = b;
    img.data[o + 3] = 255;
  }
  ctx.putImageData(img, canvas.width - 1, 0);

  // VAD indicator dot
  ctx.fillStyle = "#000";
  ctx.fillRect(canvas.width - 30, canvas.height - 28, 28, 26);
  ctx.beginPath();
  ctx.arc(canvas.width - 16, canvas.height - 15, 9, 0, 2 * Math.PI);
  ctx.fillStyle = va ? "#f33" : "#333";
  ctx.fill();
}

const status = document.getElementById("status");
let frames = 0;
// one active stream at a time: starting a new one (mic OR file) tears
// down the old so two sockets never fight over the canvas/counter
let active = null;

// a graced Stop still draining its tail: {finish, timer}. Tracked so a
// quick restart can cut it immediately instead of letting the old
// parser draw stale columns onto the new waterfall for up to 300 ms.
let pendingTeardown = null;

function teardown(a, graceMs) {
  // late events from a torn-down socket must never touch the next
  // stream's status/waterfall: detach onerror/onclose immediately.
  if (a.ws) { a.ws.onerror = null; a.ws.onclose = null; }
  // deliver the worklet's partial (<1024-sample) tail before closing —
  // otherwise the last ~64 ms of every utterance is dropped
  if (a.node) {
    try { a.node.port.postMessage({ flush: true }); } catch (e) { /* gone */ }
  }
  const finish = () => {
    if (pendingTeardown && pendingTeardown.finish === finish) {
      clearTimeout(pendingTeardown.timer);
      pendingTeardown = null;
    }
    if (a.ws) {
      a.ws.onmessage = null;
      try { a.ws.close(); } catch (e) { /* already closed */ }
    }
    if (a.audioCtx) a.audioCtx.close();
    if (a.stream) a.stream.getTracks().forEach((t) => t.stop());
  };
  // graceMs > 0 (explicit Stop): keep onmessage briefly so the flushed
  // tail's mel records still render; 0 (replaced by a new stream): cut
  // immediately so stale columns never land on the new waterfall
  if (graceMs > 0) {
    pendingTeardown = { finish, timer: setTimeout(finish, graceMs) };
  } else finish();
}

function stopActive(graceMs = 0) {
  // a restart inside a previous Stop's grace window: the old socket's
  // onmessage is still attached (rendering its flushed tail) — force
  // its finish NOW so it can never clobber the new stream's frames
  // counter/status (finish is idempotent and self-deregistering)
  if (graceMs === 0 && pendingTeardown) pendingTeardown.finish();
  const a = active;
  active = null;
  if (a) teardown(a, graceMs);
}

// One shared record parser for both paths: reassembles records across
// split/coalesced ws frames, dequantizes, checks frame_idx continuity
// (a desync would otherwise render noise forever with no error).
function makeRecordParser(label) {
  let pending = new Uint8Array(0);
  let expected = null;
  const handler = (ev) => {
    handler.lastRecordMs = Date.now();
    const merged = new Uint8Array(pending.length + ev.data.byteLength);
    merged.set(pending);
    merged.set(new Uint8Array(ev.data), pending.length);
    let off = 0;
    while (merged.length - off >= REC_SIZE) {
      const dv = new DataView(merged.buffer, merged.byteOffset + off,
                              REC_SIZE);
      const idx = dv.getUint32(0, true);
      if (expected !== null && idx !== expected) {
        console.warn(`${label}: record desync (got ${idx}, ` +
                     `expected ${expected})`);
      }
      expected = idx + 1;
      const va = dv.getUint8(4) === 1;
      const lo = dv.getFloat32(5, true);
      const hi = dv.getFloat32(9, true);
      drawColumn(merged.subarray(off + 13, off + 13 + N_MELS),
                 lo, hi, va);
      frames++;
      off += REC_SIZE;
    }
    pending = merged.slice(off);
    status.textContent = `${label} — ${frames} mel frames`;
  };
  handler.lastRecordMs = Date.now();
  return handler;
}

// Offline mode (in-page DSP): the reference demo's WASM pipeline
// equivalent — dsp.js computes the mel records IN the page, no server
// required. Records use the identical wire format, so they feed the
// same parser/renderer. Toggle via the checkbox or ?offline=1.
function offlineMode() {
  const box = document.getElementById("offline");
  return (box && box.checked)
    || new URLSearchParams(location.search).get("offline") === "1";
}

function makeOfflineSink(label, rate) {
  const engine = new MelDSP.MelEngine({ sampleRate: SAMPLE_RATE });
  const parser = makeRecordParser(label);
  const sink = (f32) => {
    const x = MelDSP.linearResample(f32, rate, SAMPLE_RATE);
    for (const rec of engine.add(x)) {
      parser({ data: MelDSP.packRecord(rec) });
    }
  };
  sink.parser = parser;
  return sink;
}

async function start() {
  stopActive();
  frames = 0;
  const stream = await navigator.mediaDevices.getUserMedia({
    audio: { channelCount: 1, sampleRate: SAMPLE_RATE },
  });
  // ask the context for 16 kHz so the browser resamples for us where it
  // can; some engines (notably Safari) ignore the hint, so report the
  // ACTUAL rate to the bridge, which then resamples server-side
  // (melspec_tpu.ops.resample.StreamingResampler)
  const audioCtx = new AudioContext({ sampleRate: SAMPLE_RATE });
  await audioCtx.audioWorklet.addModule("worklet.js");
  const src = audioCtx.createMediaStreamSource(stream);
  const node = new AudioWorkletNode(audioCtx, "pcm-capture");
  src.connect(node);
  // route through a zero-gain node to the destination: an unconnected
  // worklet is not part of the rendered graph on some engines (WebKit)
  // and its process() would never be called; gain 0 avoids mic feedback
  const mute = new GainNode(audioCtx, { gain: 0 });
  node.connect(mute).connect(audioCtx.destination);

  if (offlineMode()) {
    const sink = makeOfflineSink("offline (in-page DSP)",
                                 audioCtx.sampleRate);
    node.port.onmessage = (ev) => sink(ev.data);
    status.textContent = "offline (in-page DSP)";
    active = { audioCtx, stream, node };
  } else {
    const ws = new WebSocket(
      `ws://${location.host}/ws?rate=${audioCtx.sampleRate}`);
    ws.binaryType = "arraybuffer";
    ws.onmessage = makeRecordParser("streaming");
    ws.onopen = () => { status.textContent = "streaming"; };
    ws.onerror = () => { status.textContent = "websocket error"; };
    ws.onclose = () => {
      status.textContent = `closed after ${frames} frames`;
    };

    node.port.onmessage = (ev) => {
      // bufferedAmount bounds memory if the server stalls: past ~1 MB we
      // drop mic audio rather than buffer without limit
      if (ws.readyState === WebSocket.OPEN && ws.bufferedAmount < 1 << 20) {
        ws.send(ev.data.buffer);
      }
    };
    active = { ws, audioCtx, stream, node };
  }
  document.getElementById("start").disabled = true;
  document.getElementById("stop").disabled = false;
}

function stop() {
  stopActive(300);  // grace: render the flushed mic tail before closing
  document.getElementById("start").disabled = false;
  document.getElementById("stop").disabled = true;
}

document.getElementById("start").onclick = () =>
  start().catch((e) => { status.textContent = `error: ${e.message}`; });
document.getElementById("stop").onclick = stop;

// WAV-file path (the reference demo's wav_worker equivalent): decode via
// WebAudio (16 kHz hint; the actual decode rate is reported to the
// bridge), stream hop-sized PCM slices, pacing slightly faster than
// realtime so the waterfall animates.
document.getElementById("wavfile").onchange = async (ev) => {
  const file = ev.target.files[0];
  if (!file) return;
  stopActive();
  frames = 0;
  const dec = new AudioContext({ sampleRate: SAMPLE_RATE });
  const audio = await dec.decodeAudioData(await file.arrayBuffer());
  const pcm = audio.getChannelData(0);
  const decodedRate = dec.sampleRate; // actual, in case the hint was ignored
  dec.close();

  if (offlineMode()) {
    // in-page DSP: paced like the streaming path so the waterfall
    // animates rather than appearing at once
    const sink = makeOfflineSink("file offline (in-page DSP)", decodedRate);
    const a = { offline: true };
    active = a;
    const hop = Math.round(decodedRate * 0.16);
    for (let off = 0; off < pcm.length; off += hop) {
      if (active !== a) return; // stopped/replaced
      sink(pcm.subarray(off, off + hop));
      await new Promise((r) => setTimeout(r, 100));
    }
    status.textContent = `file done (in-page DSP) — ${frames} mel frames`;
    return;
  }

  const ws = new WebSocket(`ws://${location.host}/ws?rate=${decodedRate}`);
  ws.binaryType = "arraybuffer";
  const parser = makeRecordParser("file");
  ws.onmessage = parser;
  ws.onerror = () => { status.textContent = "websocket error (file)"; };
  ws.onclose = () => {
    status.textContent = `file done — ${frames} mel frames`;
  };
  active = { ws };
  ws.onopen = async () => {
    // 160 ms blocks AT THE DECODED RATE (hardcoding 16 kHz would pace a
    // 44.1 kHz decode at 0.58x realtime)
    const hop = Math.round(decodedRate * 0.16);
    for (let off = 0; off < pcm.length; off += hop) {
      if (ws.readyState !== WebSocket.OPEN) return; // stopped/replaced
      ws.send(pcm.subarray(off, off + hop).slice(0).buffer);
      await new Promise((r) => setTimeout(r, 100));
    }
    // drain before closing: the server still has buffered hops in
    // flight (plus its eof-drain tick), and records received while the
    // socket is CLOSING are discarded — wait until it has been quiet
    // for a while so the waterfall tail actually renders
    const t0 = Date.now();
    while (Date.now() - parser.lastRecordMs < 700
           && Date.now() - t0 < 15000) {
      await new Promise((r) => setTimeout(r, 100));
    }
    ws.close();
  };
};

// Server-side serving counters (/stats, the StreamServer.stats() JSON):
// streams in use across ALL clients, frames and ticks — the analogue of
// the reference page surfacing its SAB ring's dropped counter.
const statsEl = document.getElementById("serverstats");
if (statsEl) {
  setInterval(async () => {
    try {
      const s = await (await fetch("/stats")).json();
      statsEl.textContent =
        `server: ${s.in_use}/${s.n_streams} streams | ` +
        `${s.frames_sent} frames | ${s.ticks} ticks | ` +
        `${s.clients_served} clients | ${s.idle_timeouts} idle-timeouts`;
    } catch (e) { /* bridge restarting; keep the last reading */ }
  }, 1000);
}
