"""The bench headline's compiled-gate binding and sanity-bound rules.

VERDICT r3 items 2 and 7: ``bench.py``'s own stated rule — "a timing
headline whose numerics the compiled gates reject must never be
published" — must be ENFORCED, and the physical-impossibility recheck
must cover every fused/composite row, not just ``vad_fields``.
"""

import bench


def test_gate_fail_withholds_headline():
    row = bench._headline(("pallas_sig_256x300s", 499858.0), "fail")
    assert row["value"] == 0
    assert row["vs_baseline"] == 0
    assert row["tpu_compiled_gate"] == "fail"
    assert "withheld" in row["error"]
    assert "499" not in row["metric"]


def test_gate_error_withholds_headline():
    row = bench._headline(("pallas_sig_256x300s", 499858.0), "error")
    assert row["value"] == 0 and "error" in row


def test_gate_pass_publishes():
    row = bench._headline(("pallas_sig_256x300s", 499858.0), "pass")
    assert row["value"] == 499858.0
    assert row["tpu_compiled_gate"] == "pass"
    assert "pallas_sig_256x300s" in row["metric"]
    assert "error" not in row


def test_gate_skipped_publishes_annotated():
    # off-TPU runs have no gate to run; the row says so
    row = bench._headline(("xla_bf3_64x10s", 1234.5), "skipped")
    assert row["value"] == 1234.5
    assert row["tpu_compiled_gate"] == "skipped"


def test_sanity_bounds_cover_all_fused_rows():
    """Every fused/composite row the bench emits has a contained-kernel
    bound (the r3 guard covered vad_fields only)."""
    for row in ["vad_fields_64x10s", "quantized_sig_64x10s",
                "serving_tick_full_256sx500h",
                "serving_tick_src48_256sx500h",
                "multistream_bulk_256sx500h",
                "multistream_bulk_sig_256sx500h"]:
        assert bench._SANITY_BOUNDS.get(row), row


def test_sanity_recheck_triggers_and_keeps_conservative_estimate():
    calls = []

    def fake_bench(fn, xs, iters=16, reps=3):
        calls.append(iters)
        return 2.0  # slower re-measurement wins (conservative)

    orig = bench._bench
    bench._bench = fake_bench
    try:
        results = {"pallas_sig_64x10s": 400000.0}
        # impossible reading: 640 s / 0.0001 s = 6.4Mx >> 1.25 * 400k
        wall, rtfx = bench._sanity_recheck(
            "vad_fields_64x10s", lambda x: x, [None], 0.0001, 640.0,
            results)
        assert calls, "recheck did not re-measure"
        assert wall == 2.0 and rtfx == 320.0
        # plausible reading: no re-measure
        calls.clear()
        wall, rtfx = bench._sanity_recheck(
            "vad_fields_64x10s", lambda x: x, [None], 0.002, 640.0,
            results)
        assert not calls and wall == 0.002
        # missing bound row: no-op
        wall, rtfx = bench._sanity_recheck(
            "serving_tick_full_256sx500h", lambda x: x, [None], 0.0001,
            640.0, {})
        assert not calls
    finally:
        bench._bench = orig
