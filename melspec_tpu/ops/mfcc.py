"""Kaldi-style MFCC — cepstra over the fused fbank pipeline.

Beyond-parity: the reference crate stops at log-mel fbank features
(``src/fbank.rs``); Kaldi/sherpa-style ASR consumers usually want MFCC.
On TPU the cepstral stage is one more MXU matmul behind the fbank
kernel: the orthonormal DCT-II (Kaldi's ``ComputeDctMatrix`` —
``M[0, n] = sqrt(1/N)``, ``M[k, n] = sqrt(2/N) * cos(pi/N * (n+0.5) * k)``)
with the cepstral lifter ``1 + 0.5 * L * sin(pi * k / L)`` FOLDED into
its rows, so lifter + DCT cost a single ``[n_mels, num_ceps]``
projection that XLA fuses behind the fbank output (sig route: the fused
signal-input Pallas kernel computes the log-mel energies; the cepstral
matmul rides the same jit).

Semantics:
- fbank stage: this repo's ``Fbank`` with ``apply_cmn=False`` (Kaldi's
  MFCC never mean-normalizes the fbank internally), default 23 mel bins
  (Kaldi's ``MfccOptions``), log mel energies floored at f32 epsilon;
- DCT over the mel axis, keep ``num_ceps`` (default 13);
- cepstral liftering (default 22.0; 0 disables);
- optional CMN over the CEPSTRA (``apply_cmn``, on by default like this
  repo's fbank surface).

Differential-tested against a naive per-frame float64 reimplementation
(tests/test_mfcc.py), the repo's standard pattern for frontends without
a vendored golden.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from melspec_tpu.config import MfccConfig
from melspec_tpu.ops.fbank import Fbank

__all__ = ["Mfcc", "dct_matrix", "cepstral_lifter_coeffs"]


def dct_matrix(num_ceps: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II rows ``[num_ceps, n_mels]`` (float64), Kaldi's
    ``ComputeDctMatrix`` normalization."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(num_ceps, dtype=np.float64)[:, None]
    m = np.sqrt(2.0 / n_mels) * np.cos(np.pi / n_mels * (n + 0.5) * k)
    m[0] = np.sqrt(1.0 / n_mels)
    return m


def cepstral_lifter_coeffs(num_ceps: int, lifter: float) -> np.ndarray:
    """Kaldi's cepstral lifter ``1 + 0.5 * L * sin(pi * k / L)`` (float64;
    all-ones when ``lifter == 0``)."""
    if lifter == 0.0:
        return np.ones(num_ceps, dtype=np.float64)
    k = np.arange(num_ceps, dtype=np.float64)
    return 1.0 + 0.5 * lifter * np.sin(np.pi * k / lifter)


class Mfcc:
    """Precompiled MFCC frontend: ``compute(samples [..., T])`` ->
    ``[..., num_frames, num_ceps]`` in the pipeline dtype.

    ``fft_impl`` forwards to the underlying :class:`Fbank` ("auto" picks
    the fused signal-input Pallas kernel on MXU backends)."""

    def __init__(self, config: MfccConfig = MfccConfig(),
                 dtype=jnp.float32, fft_impl: str = "auto"):
        self.config = config
        self.dtype = dtype
        # defensive: MfccConfig validates these, but a caller passing a
        # hand-built duck-typed config must not silently double-CMN
        fb_cfg = dataclasses.replace(config.fbank, apply_cmn=False)
        self._fbank = Fbank(fb_cfg, dtype=dtype, fft_impl=fft_impl)
        # lifter folds into the DCT rows -> ONE projection matrix,
        # applied transposed ([n_mels, num_ceps]) behind the fbank
        m = dct_matrix(config.num_ceps, fb_cfg.num_mel_bins)
        m = m * cepstral_lifter_coeffs(config.num_ceps,
                                       config.cepstral_lifter)[:, None]
        self._dct_t = jnp.asarray(m.T, dtype)

    @property
    def fbank(self) -> Fbank:
        return self._fbank

    @functools.partial(jax.jit, static_argnums=0)
    def _compute_jit(self, samples: jnp.ndarray) -> jnp.ndarray:
        feats = self._fbank._compute_jit(samples)  # [..., F, n_mels]
        ceps = jnp.matmul(feats, self._dct_t,
                          preferred_element_type=self.dtype,
                          precision=jax.lax.Precision.HIGHEST)
        if self.config.apply_cmn:
            ceps = ceps - jnp.mean(ceps, axis=-2, keepdims=True)
        return ceps

    def compute(self, samples) -> jnp.ndarray:
        samples = jnp.asarray(samples)
        if samples.shape[-1] == 0:
            return jnp.zeros(samples.shape[:-1] + (0, self.config.num_ceps),
                             dtype=self.dtype)
        return self._compute_jit(samples)
