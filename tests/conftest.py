"""Test bootstrap: force an 8-device virtual CPU mesh and enable x64.

Tests must pass without a TPU (SURVEY.md §4: the reference's tests run on any
host and GPU tests skip gracefully); sharding tests use the virtual devices.
"""

import os

# MELSPEC_TPU_TESTS=1 flips the bootstrap into compiled-mode gating on the
# real chip (tests/test_tpu_compiled.py, run by bench.py): no CPU forcing,
# no x64 (TPUs have no f64), Mosaic compiles for real.
_TPU_MODE = os.environ.get("MELSPEC_TPU_TESTS") == "1"

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver env sets axon/tpu
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _TPU_MODE:
    # A sitecustomize hook may have pinned jax_platforms to a TPU tunnel
    # before this file ran; override it so tests run on the virtual CPU mesh.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"

from pathlib import Path

import pytest

# Fixtures are vendored in-repo (testdata/, MIT-licensed upstream data per
# testdata/LICENSE-MIT) so the parity suite is self-contained, mirroring the
# reference's own vendored goldens (`src/rb.rs:171-178`).  An explicit
# MELSPEC_REF_TESTDATA still overrides for cross-checking a live checkout.
_VENDORED = Path(__file__).resolve().parent.parent / "testdata"
_OVERRIDE = os.environ.get("MELSPEC_REF_TESTDATA")
REF_TESTDATA = (
    Path(_OVERRIDE)
    if _OVERRIDE and Path(_OVERRIDE).is_dir()
    else _VENDORED
)


@pytest.fixture(scope="session")
def testdata() -> Path:
    if not (REF_TESTDATA / "jfk_f32le.wav").is_file():
        pytest.fail(
            f"vendored testdata missing at {REF_TESTDATA} — the fixture suite "
            "is supposed to be self-contained"
        )
    return REF_TESTDATA


@pytest.fixture(scope="session")
def jfk_samples(testdata):
    from melspec_tpu.io.wav import read_wav_f32le

    return read_wav_f32le(testdata / "jfk_f32le.wav")
