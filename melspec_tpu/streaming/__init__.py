"""Streaming layer: overlap-and-save STFT state, ring-buffer feeder, VAD."""
