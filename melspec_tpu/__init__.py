"""melspec_tpu — a TPU-native speech-frontend framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the Rust crate
``wavey-ai/mel-spec`` (reference layout documented in SURVEY.md):

- Whisper-compatible log-mel spectrograms, fixture-aligned with whisper.cpp /
  librosa filterbanks (reference: ``src/mel.rs``).
- Streaming overlap-and-save STFT with ring-buffer semantics
  (reference: ``src/stft.rs``, ``src/rb.rs``).
- Kaldi/NeMo-style filterbank frontends (reference: ``src/fbank.rs``,
  ``src/mel.rs:172-433``).
- Model-free Sobel-edge voice activity detection with frame timestamps
  (reference: ``src/vad.rs``).
- 8-bit TGA quantized mel interchange (reference: ``src/quant.rs``).

Where the reference dispatches sparse scalar loops per frame (CPU), a cuFFT +
CUDA kernel (GPU) or WGSL shaders (wgpu), this framework batches frames and
maps the whole pipeline onto the MXU: window -> real-DFT matmul -> power ->
dense filterbank matmul -> log, fused into one Pallas kernel, with
data-parallel scale-out via ``shard_map`` over an ICI mesh.
"""

__version__ = "0.4.0"

from melspec_tpu.config import (
    BatchLogMelConfig,
    DetectionSettings,
    FbankConfig,
    MelConfig,
    WHISPER_LARGE_V3,
    MfccConfig,
)

__all__ = [
    "BatchLogMelConfig",
    "DetectionSettings",
    "FbankConfig",
    "MelConfig",
    "WHISPER_LARGE_V3",
    "MfccConfig",
    "__version__",
]
