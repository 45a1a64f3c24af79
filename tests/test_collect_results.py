"""Tests for scripts/collect_results.py (ranked LaTeX result tables —
reference scripts/collect_results.py tabilize behavior)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import collect_results


def test_rankify_orders_and_ties():
    x = np.array([30.0, 28.0, 30.0, 25.0])
    # higher better: the two 30s tie for rank 0, 28 rank 1, 25 rank 2.
    np.testing.assert_array_equal(
        collect_results.rankify(x, 1), [0, 1, 0, 2])
    # lower better
    np.testing.assert_array_equal(
        collect_results.rankify(x, -1), [2, 1, 2, 0])
    # uncolored
    assert (collect_results.rankify(x, 0) == 10**5).all()


def test_tabilize_tags_and_nan(capsys):
    results = {
        "ours": [30.0, 0.05],
        "base": [28.0, 0.10],
        "half": [np.nan, 0.20],
    }
    lines = collect_results.tabilize(
        results, precisions=[2, 3], rank_order=[1, -1])
    out = "\n".join(lines)
    assert "tabfirst" in out and "tabsecond" in out
    # best psnr row carries the first-place tag before its value
    ours_line = [l for l in lines if l.startswith("ours")][0]
    assert "tabfirst" in ours_line.split("&")[1]
    assert "30.00" in ours_line
    # NaN renders as '-' with no color tag in that cell
    half_line = [l for l in lines if l.startswith("half")][0]
    assert " - " in half_line.split("&")[1]
    # last row has no trailing \\
    assert not lines[-1].rstrip().endswith("\\\\")


def test_results_table_end_to_end(tmp_path, capsys):
    # Two methods x two scenes of Trainer-format results.txt files.
    for scene in ("cornell", "pots"):
        for method, psnr in (("cache", 25.0), ("ours", 30.0)):
            d = tmp_path / f"{scene}_{method}" / "save"
            d.mkdir(parents=True)
            (d / "results.txt").write_text(
                f"psnr: [{psnr}]\nlpips: [0.1]\nssim: [0.9]\n"
                "mae: [10.0]\nl1_median: [0.05]\ntransient_iou: [0.5]\n"
            )
    results = collect_results.results_table(
        str(tmp_path), ["cornell", "pots"],
        {"cache": "Cache", "ours": "Ours"})
    np.testing.assert_allclose(results["Ours"][0], 30.0)
    np.testing.assert_allclose(results["Cache"][0], 25.0)
    # Missing scene dirs are reported, not fatal.
    results2 = collect_results.results_table(
        str(tmp_path), ["cornell", "missing_scene"],
        {"cache": "Cache"})
    np.testing.assert_allclose(results2["Cache"][0], 25.0)
    assert "missing" in capsys.readouterr().out
