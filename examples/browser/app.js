// Live mel waterfall client.
//
// Wire record from the bridge (little-endian, one per emitted frame):
//   u32 frame_idx | u8 va | f32 min | f32 max | u8[nMels] quantized
// The payload is the whisper-normalized mel column quantized to 8 bits
// over [min, max] (see examples/serve_streams.py's protocol note).

const N_MELS = 80;
const REC_SIZE = 4 + 1 + 4 + 4 + N_MELS;
const SAMPLE_RATE = 16000;

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

function drawColumn(bytes, va) {
  // scroll left one column
  ctx.globalCompositeOperation = "copy";
  ctx.drawImage(canvas, 1, 0, canvas.width - 1, canvas.height,
                0, 0, canvas.width - 1, canvas.height);
  ctx.globalCompositeOperation = "source-over";

  const img = ctx.createImageData(1, N_MELS);
  const stops = va ? VOICED : CALM;
  for (let m = 0; m < N_MELS; m++) {
    const [r, g, b] = colorize(bytes[m] / 255, stops);
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

let audioCtx = null, ws = null, stream = null, frames = 0;
const status = document.getElementById("status");

async function start() {
  stream = await navigator.mediaDevices.getUserMedia({
    audio: { channelCount: 1, sampleRate: SAMPLE_RATE },
  });
  // ask the context for 16 kHz so the browser resamples for us where it
  // can; some engines (notably Safari) ignore the hint, so report the
  // ACTUAL rate to the bridge, which then resamples server-side
  // (melspec_tpu.ops.resample.StreamingResampler)
  audioCtx = new AudioContext({ sampleRate: SAMPLE_RATE });
  await audioCtx.audioWorklet.addModule("worklet.js");
  const src = audioCtx.createMediaStreamSource(stream);
  const node = new AudioWorkletNode(audioCtx, "pcm-capture");
  src.connect(node);

  ws = new WebSocket(`ws://${location.host}/ws?rate=${audioCtx.sampleRate}`);
  ws.binaryType = "arraybuffer";
  let pending = new Uint8Array(0);
  ws.onmessage = (ev) => {
    // records can split/coalesce across ws frames; reassemble
    const merged = new Uint8Array(pending.length + ev.data.byteLength);
    merged.set(pending);
    merged.set(new Uint8Array(ev.data), pending.length);
    let off = 0;
    while (merged.length - off >= REC_SIZE) {
      const dv = new DataView(merged.buffer, off, REC_SIZE);
      const va = dv.getUint8(4) === 1;
      drawColumn(merged.subarray(off + 13, off + 13 + N_MELS), va);
      frames++;
      off += REC_SIZE;
    }
    pending = merged.slice(off);
    status.textContent = `streaming — ${frames} mel frames`;
  };
  ws.onopen = () => { status.textContent = "streaming"; };
  ws.onclose = () => { status.textContent = `closed after ${frames} frames`; };

  node.port.onmessage = (ev) => {
    if (ws.readyState === WebSocket.OPEN) ws.send(ev.data.buffer);
  };

  document.getElementById("start").disabled = true;
  document.getElementById("stop").disabled = false;
}

function stop() {
  if (ws) ws.close();
  if (audioCtx) audioCtx.close();
  if (stream) stream.getTracks().forEach((t) => t.stop());
  document.getElementById("start").disabled = false;
  document.getElementById("stop").disabled = true;
}

document.getElementById("start").onclick = () =>
  start().catch((e) => { status.textContent = `error: ${e.message}`; });
document.getElementById("stop").onclick = stop;

// WAV-file path (the reference demo's wav_worker equivalent): decode via
// WebAudio at 16 kHz, stream hop-sized PCM slices over the same socket,
// pacing slightly faster than realtime so the waterfall animates.
document.getElementById("wavfile").onchange = async (ev) => {
  const file = ev.target.files[0];
  if (!file) return;
  const dec = new AudioContext({ sampleRate: SAMPLE_RATE });
  const audio = await dec.decodeAudioData(await file.arrayBuffer());
  const pcm = audio.getChannelData(0);
  const decodedRate = dec.sampleRate; // actual, in case the hint was ignored
  dec.close();

  ws = new WebSocket(`ws://${location.host}/ws?rate=${decodedRate}`);
  ws.binaryType = "arraybuffer";
  let pending = new Uint8Array(0);
  let lastRecordMs = Date.now();
  frames = 0;
  ws.onmessage = document.querySelector("#canvas") && ((e) => {
    lastRecordMs = Date.now();
    const merged = new Uint8Array(pending.length + e.data.byteLength);
    merged.set(pending);
    merged.set(new Uint8Array(e.data), pending.length);
    let off = 0;
    while (merged.length - off >= REC_SIZE) {
      const dv = new DataView(merged.buffer, off, REC_SIZE);
      drawColumn(merged.subarray(off + 13, off + 13 + N_MELS),
                 dv.getUint8(4) === 1);
      frames++;
      off += REC_SIZE;
    }
    pending = merged.slice(off);
    status.textContent = `file: ${frames} mel frames`;
  });
  ws.onopen = async () => {
    const hop = 160 * 16; // ship 160 ms blocks
    for (let off = 0; off < pcm.length; off += hop) {
      ws.send(pcm.subarray(off, off + hop).slice(0).buffer);
      await new Promise((r) => setTimeout(r, 100));
    }
    // drain before closing: the server still has buffered hops in
    // flight (plus its eof-drain tick), and records received while the
    // socket is CLOSING are discarded — wait until it has been quiet
    // for a while so the waterfall tail actually renders
    const t0 = Date.now();
    while (Date.now() - lastRecordMs < 700 && Date.now() - t0 < 15000) {
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
