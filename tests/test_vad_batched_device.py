"""On-device batched VAD decision fields: parity with the host path and
jit/shard compatibility."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from melspec_tpu.config import DetectionSettings
from melspec_tpu.ops.vad import (
    streaming_decision_fields,
    streaming_decision_fields_batched,
)


def test_batched_fields_match_host():
    rng = np.random.default_rng(0)
    mels = rng.random((3, 40, 200)) * 3.0
    settings = DetectionSettings(min_energy=0.9, min_y=4, min_x=6, min_mel=1)
    got = jax.jit(
        lambda m: streaming_decision_fields_batched(m, settings)
    )(jnp.asarray(mels))
    for b in range(3):
        want = streaming_decision_fields(mels[b], settings)
        np.testing.assert_array_equal(np.asarray(got["active"][b]),
                                      want["active"])
        np.testing.assert_array_equal(np.asarray(got["leading"][b]),
                                      want["leading"])
        np.testing.assert_array_equal(np.asarray(got["active_columns"][b]),
                                      want["active_columns"])
        np.testing.assert_allclose(np.asarray(got["confidence"][b]),
                                   want["confidence"])


def test_batched_fields_sharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from melspec_tpu.parallel import make_mesh

    mesh = make_mesh()
    spec = NamedSharding(mesh, P("batch"))
    settings = DetectionSettings(min_energy=0.9, min_y=4, min_x=6, min_mel=1)
    fn = jax.jit(
        lambda m: streaming_decision_fields_batched(m, settings),
        in_shardings=spec,
    )
    rng = np.random.default_rng(1)
    mels = jnp.asarray(rng.random((8, 40, 120)) * 3.0)
    out = fn(mels)
    assert out["active"].shape == (8, 120 - 6 + 1)


def test_batched_fields_rejects_degenerate():
    with pytest.raises(ValueError):
        streaming_decision_fields_batched(
            jnp.zeros((1, 40, 4)), DetectionSettings(min_x=6)
        )


def test_batched_fields_f32_parity_jfk(jfk_samples):
    """The eval path's classification dtype story: with x64 off (the TPU
    default) the batched decision fields run in f32 — they must equal the
    sequential float64 host path decision-for-decision on real speech
    (`utils/vad_eval.py` device_pass relies on this)."""
    from melspec_tpu.config import DetectionSettings as DS
    from melspec_tpu.ops.spectrogram import WhisperMelPipeline

    pipe = WhisperMelPipeline(400, 160, 80, 16000.0)
    mel = np.asarray(
        pipe._mel_batch_jit(jnp.asarray(jfk_samples[None, :], jnp.float32))
    )[0]
    img = mel.T  # [n_mels, frames]
    for settings in (DS(), DS(min_energy=0.98, min_y=11, min_x=5, min_mel=2)):
        want = streaming_decision_fields(img.astype(np.float64), settings)
        got = jax.jit(
            lambda m, s=settings: streaming_decision_fields_batched(m, s)
        )(jnp.asarray(img[None], jnp.float32))
        for k in ("active", "leading", "active_columns", "window_columns"):
            np.testing.assert_array_equal(
                np.asarray(got[k][0]), want[k],
                err_msg=f"f32 batched VAD field {k} diverged from f64 host",
            )


def test_fused_kernel_vad_epilogue_matches_classify(jfk_samples):
    """whisper_mel_vad_sig's in-kernel Sobel raw activity == the XLA
    classify_columns over the same mel image, decision-for-decision —
    including the two recomputed columns at every tile boundary."""
    from melspec_tpu.ops.mel_kernel import whisper_mel_vad_sig
    from melspec_tpu.ops.vad import classify_columns

    settings = DetectionSettings()
    rng = np.random.default_rng(5)
    # JFK (crosses 2 tile boundaries at 1097 frames) + random batch
    for x in (np.asarray(jfk_samples),
              (rng.normal(size=(3, 16000 * 12)) * 0.3).astype(np.float32)):
        mel, raw = whisper_mel_vad_sig(x, settings, interpret=True)
        img = jnp.swapaxes(jnp.asarray(mel), -1, -2)
        want = classify_columns(img, settings)
        np.testing.assert_array_equal(np.asarray(raw), np.asarray(want))


def test_fused_kernel_vad_streaming_and_edge_settings(jfk_samples):
    from melspec_tpu.ops.mel_kernel import whisper_mel_vad_sig
    from melspec_tpu.ops.vad import classify_columns

    x = np.asarray(jfk_samples)[: 16000 * 4]
    for settings in (
        DetectionSettings(min_y=0),                      # all-active special case
        DetectionSettings(min_mel=200),                  # start_y clamped past H-2
        DetectionSettings(min_energy=0.1, min_y=1),
    ):
        mel, raw = whisper_mel_vad_sig(x, settings, streaming=True,
                                       interpret=True)
        want = classify_columns(jnp.asarray(mel).T, settings)
        np.testing.assert_array_equal(np.asarray(raw), np.asarray(want))


def test_batched_fields_accept_precomputed_raw():
    rng = np.random.default_rng(1)
    mels = jnp.asarray(rng.random((2, 30, 120)) * 3.0)
    settings = DetectionSettings(min_energy=0.9, min_y=3, min_x=6, min_mel=1)
    from melspec_tpu.ops.vad import classify_columns

    raw = classify_columns(mels, settings)
    base = streaming_decision_fields_batched(mels, settings)
    via_raw = streaming_decision_fields_batched(None, settings, raw=raw)
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(via_raw[k]))
