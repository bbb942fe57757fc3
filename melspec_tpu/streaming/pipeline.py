"""Live-audio streaming pipeline: sample ring -> hop drain -> device mel.

The TPU counterpart of the reference's ``RingBuffer`` (``src/rb.rs``): a
native lock-free sample ring feeds hop-sized chunks into the streaming mel
state. Two drain modes:

- ``maybe_mel()``: one hop per call, exactly the reference's cadence
  (``src/rb.rs:86-121``) — drains exactly ``hop_size`` samples and emits a
  whisper-normalized ``[n_mels, 1]`` column once the first window fills;
- ``drain_mels()``: drains every complete hop currently buffered and runs
  them through one ``lax.scan`` dispatch — the catch-up/bulk mode that
  amortizes device-call overhead, which the per-frame reference design
  cannot do.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from melspec_tpu.config import MelConfig
from melspec_tpu.runtime.ringbuffer import SampleRing
from melspec_tpu.streaming.stft import StreamingMel


class RingBuffer:
    def __init__(self, config: MelConfig, capacity: int, dtype=jnp.float32):
        if capacity < config.hop_size:
            # SampleRing rounds capacity to a power of two; anything below
            # one hop could never drain a frame — the pipeline would
            # silently emit nothing forever
            raise ValueError(
                f"capacity {capacity} < hop_size {config.hop_size}: "
                "the ring could never hold one hop"
            )
        self.config = config
        self._ring = SampleRing(capacity)
        self._accumulated = np.zeros(0, dtype=np.float32)
        self._mel = StreamingMel(config, dtype=dtype)
        self._state = self._mel.init()

    def add_frame(self, samples: np.ndarray) -> int:
        """Push a block of samples; excess beyond capacity is dropped
        (reference ``src/rb.rs:54-70``). Returns samples accepted."""
        return self._ring.push(np.asarray(samples, dtype=np.float32))

    def add(self, sample: float) -> None:
        self._ring.push(np.asarray([sample], dtype=np.float32))

    def _drain_hops(self, max_hops: Optional[int] = None) -> np.ndarray:
        """Pull as many complete hops as available (<= max_hops)."""
        hop = self.config.hop_size
        want = len(self._ring) + self._accumulated.size
        n_hops = want // hop
        if max_hops is not None:
            n_hops = min(n_hops, max_hops)
        if n_hops == 0:
            return np.zeros((0, hop), dtype=np.float32)
        need = n_hops * hop - self._accumulated.size
        pulled = self._ring.pop(need)
        samples = np.concatenate([self._accumulated, pulled])
        n_hops = samples.size // hop
        rem = samples.size - n_hops * hop
        self._accumulated = samples[samples.size - rem :]
        return samples[: n_hops * hop].reshape(n_hops, hop)

    def maybe_mel(self) -> Optional[np.ndarray]:
        """Drain one hop if available; returns ``[n_mels, 1]`` once the
        overlap window has filled, else None."""
        chunks = self._drain_hops(max_hops=1)
        if chunks.shape[0] == 0:
            return None
        self._state, mels, valid = self._mel.push_many(self._state, chunks)
        if not bool(valid[0]):
            return None
        return mels[0][:, None]

    def drain_mels(self) -> List[np.ndarray]:
        """Drain all buffered complete hops in one scan dispatch; returns a
        list of ``[n_mels, 1]`` frames (possibly empty)."""
        chunks = self._drain_hops()
        if chunks.shape[0] == 0:
            return []
        self._state, mels, valid = self._mel.push_many(self._state, chunks)
        return [mels[i][:, None] for i in range(mels.shape[0]) if bool(valid[i])]
