"""Directional assertions for the two-scale quality check (QUALITY.md):
the reference AnalysisReport.md §2 shape — recall rises sharply with
corpus size, precision stays high at both scales — must hold for the
end-to-end CLI on the synthetic generator's corpora."""

from __future__ import annotations

from tools.quality_report import run_scale


def test_scaling_shape(spark, tmp_path):
    small = run_scale(str(tmp_path / "small"), 6)
    large = run_scale(str(tmp_path / "large"), 60)

    # recall rises sharply with 10x data (data-sparsity easing)
    assert large["recall"] >= small["recall"] + 0.25, (small, large)
    assert large["pairs_found"] > small["pairs_found"]
    # precision stays high at BOTH scales (no hallucinated pairs)
    assert small["precision"] >= 0.75, small
    assert large["precision"] >= 0.75, large
    # and F1 follows recall
    assert large["f1"] > small["f1"]
