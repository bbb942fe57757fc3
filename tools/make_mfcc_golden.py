#!/usr/bin/env python
"""MFCC golden generator — the MFCC analogue of the reference's
``testdata/kaldi.py`` (which runs ``kaldi_native_fbank`` to dump the
vendored fbank golden this repo gates against at 0.0152).

Writes ``testdata/kaldi_native_mfcc_jfk.npz`` with the external tool's
MFCC of the JFK clip at this repo's ``MfccConfig(fbank=FbankConfig(
apply_cmn=False))`` settings (80 mel bins, 13 cepstra, lifter 22,
dither 0, CMN over cepstra applied here).

Requires the optional ``kaldi_native_fbank`` package — absent from this
image (docs/PARITY.md); until it exists, the external anchor is enforced
through the vendored fbank golden instead: the lifted DCT-II is linear
over the mel axis, so applying it (in f64) to the golden fbank IS the
external cepstra — see
tests/test_mfcc.py::test_mfcc_external_anchor_via_kaldi_native_golden.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "testdata"


def main():
    try:
        import kaldi_native_fbank as knf
    except ImportError:
        print("kaldi_native_fbank is not installed — cannot generate; "
              "the fbank-golden-derived anchor in tests/test_mfcc.py "
              "covers the gap (see docstring).", file=sys.stderr)
        return 1

    from melspec_tpu.io.wav import read_wav_f32le

    samples = read_wav_f32le(OUT / "jfk_f32le.wav")
    opts = knf.MfccOptions()
    opts.frame_opts.dither = 0.0
    opts.frame_opts.snip_edges = True
    opts.mel_opts.num_bins = 80
    opts.num_ceps = 13
    opts.cepstral_lifter = 22.0
    opts.use_energy = False
    mfcc = knf.OnlineMfcc(opts)
    mfcc.accept_waveform(16000, samples.tolist())
    mfcc.input_finished()
    feats = np.stack([mfcc.get_frame(i)
                      for i in range(mfcc.num_frames_ready)])
    feats = feats - feats.mean(axis=0, keepdims=True)  # CMN over cepstra
    np.savez(OUT / "kaldi_native_mfcc_jfk.npz", features=feats.T)
    print(f"wrote kaldi_native_mfcc_jfk.npz {feats.T.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
