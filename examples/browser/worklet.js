// Capture worklet: forwards each 128-sample render quantum of the mic
// input to the main thread, which batches and ships it over the
// WebSocket. (The reference's worklet pushes into a SharedArrayBuffer
// ring consumed by an in-page WASM DSP worker; here the DSP is
// server-side, so a plain message port is all that's needed.)
registerProcessor(
  "pcm-capture",
  class extends AudioWorkletProcessor {
    process(inputs) {
      const ch = inputs[0][0];
      if (ch) this.port.postMessage(ch.slice(0));
      return true;
    }
  }
);
