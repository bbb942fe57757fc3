"""Host-side I/O: WAV decoding, TGA quantized-mel interchange."""
