"""Offline metric evaluation over saved render directories.

Behavioral parity target: reference evaluation/run_evaluation.py — computes
PSNR/SSIM (and LPIPS when weights are available) between two directories of
saved .npy images and prints per-image + mean values.

LPIPS/E-LPIPS run through the pure-JAX implementation in
neural_radiance_caching_tpu/ops/lpips.py (replacing the reference's TF1
lpips_tf + evaluation/elpips). Calibrated VGG weights are searched at the
documented paths (NRC_LPIPS_WEIGHTS env var, ~/.cache/..., <repo>/weights/);
pass --lpips_weights to point at a specific .npz (see
scripts/convert_lpips_weights.py). Without weights LPIPS is scored with the
deterministic uncalibrated fallback and the JSON carries
`lpips_calibrated: false` (see ops/lpips.py for what that variant means).

Usage:
    python evaluation/run_evaluation.py --gt_dir SAVE/color_gt --pred_dir SAVE/color
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def mse_to_psnr(mse):
    return -10.0 / np.log(10.0) * np.log(mse)


def compute_psnr(image0, image1):
    return float(mse_to_psnr(((image0 - image1) ** 2).mean()))


def compute_ssim(image0, image1):
    from neural_radiance_caching_tpu.ops import image as image_lib

    return float(image_lib.ssim(image0, image1))


def load_image(path):
    if path.endswith(".npy"):
        img = np.load(path)
    else:
        from PIL import Image

        img = np.asarray(Image.open(path), np.float32) / 255.0
    return np.clip(np.nan_to_num(img[..., :3].astype(np.float32)), 0.0, 1.0)


def get_files(gt_dir, pred_dir):
    def files(d):
        out = sorted(glob.glob(os.path.join(d, "*.npy")))
        return out or sorted(glob.glob(os.path.join(d, "*.png")))

    gt_files, pred_files = files(gt_dir), files(pred_dir)
    if len(gt_files) != len(pred_files):
        raise ValueError(
            f"count mismatch: {len(gt_files)} gt vs {len(pred_files)} pred"
        )
    return gt_files, pred_files


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gt_dir", required=True)
    parser.add_argument("--pred_dir", required=True)
    parser.add_argument("--lpips_weights", default=None)
    parser.add_argument(
        "--elpips_samples", type=int, default=0,
        help="if >0, also compute E-LPIPS with this many ensemble samples",
    )
    parser.add_argument("--out", default=None, help="optional JSON output path")
    args = parser.parse_args()

    from neural_radiance_caching_tpu.ops import lpips as lpips_lib

    lpips_params = lpips_lib.default_params(args.lpips_weights)
    if not lpips_params.get("calibrated", False):
        print("LPIPS: no calibrated weights found — scoring with the "
              "deterministic UNCALIBRATED fallback (untrained VGG; see "
              "ops/lpips.py and scripts/convert_lpips_weights.py). Values "
              "are self-consistent, not comparable to published tables.")

    gt_files, pred_files = get_files(args.gt_dir, args.pred_dir)
    psnrs, ssims, lpipss, elpipss = [], [], [], []
    for gt_f, pred_f in zip(gt_files, pred_files):
        gt, pred = load_image(gt_f), load_image(pred_f)
        psnrs.append(compute_psnr(pred, gt))
        ssims.append(compute_ssim(pred, gt))
        line = f"{os.path.basename(pred_f)}: psnr={psnrs[-1]:.3f} ssim={ssims[-1]:.4f}"
        if lpips_params is not None:
            lpipss.append(float(lpips_lib.lpips(lpips_params, pred, gt)))
            line += f" lpips={lpipss[-1]:.4f}"
            if args.elpips_samples > 0:
                elpipss.append(lpips_lib.elpips(
                    lpips_params, pred, gt, num_samples=args.elpips_samples
                ))
                line += f" elpips={elpipss[-1]:.4f}"
        print(line)

    result = {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "lpips": float(np.mean(lpipss)) if lpipss else None,
        "lpips_calibrated": bool(lpips_params.get("calibrated", False)),
        "elpips": float(np.mean(elpipss)) if elpipss else None,
        "count": len(psnrs),
    }
    if elpipss:
        # Matches the reference's fast_and_approximate ensemble: crop-mode
        # transforms + shared network dropout keep_prob=0.99 (ops/lpips.py).
        # The non-approximate reference mode additionally uses scaling/color
        # transforms — hence the remaining caveat string.
        result["elpips_caveat"] = (
            "fast_and_approximate ensemble: crop-mode transforms, "
            "keep_prob=0.99 network dropout (see ops/lpips.py)"
        )
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
