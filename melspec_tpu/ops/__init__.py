"""Core feature-extraction ops: filterbanks, windows, framing, DFT, spectrograms."""
