"""Example applications smoke tests (subprocess, CPU platform) — pins the
CLI surface the way the reference pins its examples via readme tests."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
REF = REPO / "testdata"


def run(args, timeout=600):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, capture_output=True, text=True,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def pcm_file(tmp_path_factory):
    if not REF.is_dir():
        pytest.skip("reference testdata unavailable")
    from melspec_tpu.io.wav import read_wav_f32le

    path = tmp_path_factory.mktemp("pcm") / "jfk.f32le"
    path.write_bytes(read_wav_f32le(REF / "jfk_f32le.wav")[:64000].tobytes())
    return path


def test_mel_tga_and_tga_to_asr(pcm_file, tmp_path):
    out_dir = tmp_path / "mels"
    with open(pcm_file, "rb") as fh:
        proc = subprocess.run(
            [sys.executable, "examples/mel_tga.py", "--platform", "cpu",
             "--out-dir", str(out_dir)],
            cwd=REPO, stdin=fh, capture_output=True, text=True, timeout=600,
        )
    assert proc.returncode == 0, proc.stderr[-500:]
    tgas = sorted(out_dir.glob("*.tga"))
    assert tgas

    proc = run(["examples/tga_to_asr.py", str(tgas[0]),
                "--out", str(tmp_path / "feats.npz")])
    assert proc.returncode == 0, proc.stderr[-500:]
    z = np.load(tmp_path / "feats.npz")
    assert z["input_features"].shape[1] == 80


def test_waterfall(tmp_path):
    if not REF.is_dir():
        pytest.skip("reference testdata unavailable")
    out = tmp_path / "wf.png"
    proc = run(["examples/waterfall.py", str(REF / "jfk_f32le.wav"),
                "--out", str(out), "--platform", "cpu"])
    assert proc.returncode == 0, proc.stderr[-500:]
    assert out.stat().st_size > 1000


def test_vad_ten_eval_cli():
    if not (REF / "ten-vad").is_dir():
        pytest.skip("ten-vad testset unavailable")
    proc = run(["examples/vad_ten_eval.py", "--platform", "cpu",
                "--max-files", "2"])
    assert proc.returncode == 0, proc.stderr[-500:]
    assert "macro:" in proc.stdout and "rtfx" in proc.stdout


def test_stream_asr_segments(pcm_file, tmp_path):
    with open(pcm_file, "rb") as fh:
        proc = subprocess.run(
            [sys.executable, "examples/stream_asr_segments.py",
             "--platform", "cpu", "--out-dir", str(tmp_path)],
            cwd=REPO, stdin=fh, capture_output=True, text=True, timeout=600,
        )
    assert proc.returncode == 0, proc.stderr[-500:]
