// Capture worklet: accumulates the mic's 128-sample render quanta and
// posts ~8 at a time to the main thread (one transferable buffer per
// ~1024 samples instead of 125-375 postMessage hops + WebSocket sends
// per second), which ships each batch over the WebSocket. (The
// reference's worklet pushes into a SharedArrayBuffer ring consumed by
// an in-page WASM DSP worker; here the DSP is server-side, so a plain
// message port is all that's needed.)
//
// The page posts {flush: true} on Stop so the partial (<1024-sample)
// tail is delivered before the AudioContext closes — without it the
// last ~64 ms of every utterance would be silently dropped.
registerProcessor(
  "pcm-capture",
  class extends AudioWorkletProcessor {
    constructor() {
      super();
      this.chunks = [];
      this.n = 0;
      this.port.onmessage = (e) => {
        if (e.data && e.data.flush) this.flush();
      };
    }
    flush() {
      if (this.n === 0) return;
      const out = new Float32Array(this.n);
      let o = 0;
      for (const c of this.chunks) { out.set(c, o); o += c.length; }
      this.port.postMessage(out, [out.buffer]);
      this.chunks = [];
      this.n = 0;
    }
    process(inputs) {
      const ch = inputs[0][0];
      if (ch) {
        this.chunks.push(ch.slice(0));
        this.n += ch.length;
        if (this.n >= 1024) this.flush();  // ~64 ms @16 kHz, ~21 ms @48 kHz
      }
      return true;
    }
  }
);
