"""Aggregate per-scene results.txt files into a LaTeX-ready ranked table.

Behavioral parity target: reference scripts/collect_results.py — loads the
`results.txt` metric dumps written by the Trainer's vis-only mode, averages
per method across scenes, and prints rows color-tagged by rank.
"""

from __future__ import annotations

import argparse
import ast
import os

import numpy as np

METRICS = ["psnr", "lpips", "ssim", "mae", "l1_median", "transient_iou"]
# +1 = higher is better, -1 = lower is better, 0 = uncolored.
RANK_ORDER = [1, -1, 1, -1, -1, 1]
PRECISIONS = [2] * len(METRICS)

_TAGS = [
    " \\cellcolor{tabfirst}",
    "\\cellcolor{tabsecond}",
    " \\cellcolor{tabthird}",
    "                     ",
]


def rankify(x, order):
    """Vector of values -> ranks with tie handling.

    Deviation from the reference: NaNs are excluded from the rank universe.
    The reference's version lets NaN occupy the top rank slot (np.unique
    sorts NaN last, so reversing for higher-is-better puts it first), which
    silently demotes every real value's color when one method misses a
    metric. NaN cells are never colored either way (tabilize checks isnan),
    so this only restores the correct colors for the real values.
    """
    if order == 0:
        return np.full_like(x, 10**5, dtype=np.int32)
    u = np.sort(np.unique(x[~np.isnan(x)]))
    if order == 1:
        u = u[::-1]
    r = np.zeros_like(x, dtype=np.int32)
    for ui, uu in enumerate(u):
        r[x == uu] = ui
    return r.astype(np.int32)


def tabilize(results, precisions, rank_order, suffixes=None, hlines=()):
    names = list(results.keys())
    data = np.array(list(results.values()), dtype=np.float64)
    suffixes = suffixes or [""] * len(precisions)
    max_len = max(len(v) for v in names)
    names_padded = [v + " " * (max_len - len(v)) for v in names]

    scale = 10.0 ** np.array(precisions)[None, :]
    data_q = np.round(data * scale) / scale
    tagranks = np.stack(
        [
            np.clip(rankify(data_q[:, d], rank_order[d]), 0, len(_TAGS) - 1)
            for d in range(data_q.shape[1])
        ],
        -1,
    )

    lines = []
    for i, name in enumerate(names_padded):
        line = ("\\hline\n" if i in hlines else "") + name
        for d in range(data_q.shape[1]):
            line += " & "
            if rank_order[d] != 0 and not np.isnan(data[i, d]):
                line += _TAGS[tagranks[i, d]]
            if np.isnan(data[i, d]):
                line += " - "
            else:
                line += f"{data_q[i, d]:0.{precisions[d]}f}" + suffixes[d]
        if i < len(names_padded) - 1:
            line += " \\\\"
        lines.append(line)
    print("\n".join(lines))
    return lines


def load_results_file(path):
    """Parse a Trainer results.txt ('metric: [values...]' per line)."""
    result = {}
    with open(path) as f:
        for line in f.read().strip().split("\n"):
            key, value = line.split(": ", 1)
            result[key.strip()] = ast.literal_eval(value)
    return result


def results_table(checkpoint_path, scenes, methods, metrics=METRICS):
    results = {}
    for method, label in methods.items():
        acc = np.full(len(metrics), np.nan)
        count = 0
        for scene in scenes:
            path = os.path.join(
                checkpoint_path, f"{scene}_{method}", "save", "results.txt"
            )
            if not os.path.exists(path):
                print(f"missing: {path}")
                continue
            res = load_results_file(path)
            vals = np.array([res.get(m, [np.nan])[-1] for m in metrics])
            acc = np.where(np.isnan(acc), 0.0, acc) + vals
            count += 1
        results[label] = (acc / max(count, 1)).tolist()
    tabilize(results, PRECISIONS, RANK_ORDER)
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", default="./checkpoints/yobo_results/synthetic")
    parser.add_argument("--scenes", nargs="+", default=["cornell", "pots", "peppers", "kitchen"])
    parser.add_argument(
        "--methods", nargs="+",
        default=["cache=Cache", "material_light_from_scratch_resample=Ours"],
        help="stage=Label pairs",
    )
    args = parser.parse_args()
    methods = dict(m.split("=", 1) for m in args.methods)
    results_table(args.checkpoint_path, args.scenes, methods)


if __name__ == "__main__":
    main()
