"""Test bootstrap: force an 8-device virtual CPU mesh and enable x64.

Tests must pass without a TPU (SURVEY.md §4: the reference's tests run on any
host and GPU tests skip gracefully); sharding tests use the virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver env sets axon/tpu
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# A sitecustomize hook may have pinned jax_platforms to a TPU tunnel before
# this file ran; override it so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"

from pathlib import Path

import pytest

REF_TESTDATA = Path(
    os.environ.get("MELSPEC_REF_TESTDATA", "/root/reference/testdata")
)


@pytest.fixture(scope="session")
def testdata() -> Path:
    if not REF_TESTDATA.is_dir():
        pytest.skip(f"reference testdata not available at {REF_TESTDATA}")
    return REF_TESTDATA


@pytest.fixture(scope="session")
def jfk_samples(testdata):
    from melspec_tpu.io.wav import read_wav_f32le

    return read_wav_f32le(testdata / "jfk_f32le.wav")
