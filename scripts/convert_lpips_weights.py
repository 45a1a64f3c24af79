"""Convert pretrained LPIPS weights into the .npz this framework loads.

The JAX LPIPS implementation (neural_radiance_caching_tpu/ops/lpips.py)
expects an .npz with keys conv{0..12}_w [3,3,cin,cout] / conv{0..12}_b [cout]
(VGG-16 convs in HWIO layout) and lin{0..4} [c] (the LPIPS linear heads).

Two source formats are supported — run this wherever you have the weights
and network access, then copy the .npz to one of the documented search
paths (NRC_LPIPS_WEIGHTS / ~/.cache/neural_radiance_caching_tpu/
lpips_vgg16.npz / <repo>/weights/lpips_vgg16.npz):

1. torch (the `lpips` pip package + torchvision VGG16):
     python scripts/convert_lpips_weights.py --torch --out lpips_vgg16.npz
   Reads torchvision's VGG-16 ImageNet features and the lpips package's
   `vgg.pth` linear heads; transposes OIHW conv kernels to HWIO.

2. E-LPIPS .npy dicts (reference evaluation/elpips/ checkout with
   vgg16_pytorch_transposed_nonlinear_features.npy + vgg_maxpool.npy):
     python scripts/convert_lpips_weights.py \
         --elpips_dir /path/to/elpips --out lpips_vgg16.npz
   Those dicts already hold HWIO kernels keyed by torchvision feature
   indices (networks.py:469-560) and heads keyed lin{i}.model.1.weight.
"""

from __future__ import annotations

import argparse

import numpy as np

# torchvision vgg16.features indices of the 13 conv layers, in order.
TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def from_torch(out_path):
    import lpips as lpips_pkg  # noqa: F401  (pulls the linear-head weights)
    import torch
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    arrays = {}
    for i, idx in enumerate(TORCH_CONV_IDX):
        conv = vgg[idx]
        # torch OIHW -> HWIO
        arrays[f"conv{i}_w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        arrays[f"conv{i}_b"] = conv.bias.detach().numpy()
    net = lpips_pkg.LPIPS(net="vgg")
    for j, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, c, 1, 1]
        arrays[f"lin{j}"] = np.maximum(w.reshape(-1), 0.0)
    np.savez(out_path, **arrays)
    del torch
    print(f"wrote {out_path}")


def from_elpips(elpips_dir, out_path):
    import os

    feats = np.load(
        os.path.join(
            elpips_dir, "vgg16_pytorch_transposed_nonlinear_features.npy"
        ),
        allow_pickle=True,
    ).item()
    heads = np.load(
        os.path.join(elpips_dir, "vgg_maxpool.npy"), allow_pickle=True
    ).item()
    arrays = {}
    for i, idx in enumerate(TORCH_CONV_IDX):
        arrays[f"conv{i}_w"] = np.asarray(feats[f"{idx}.weight"], np.float32)
        arrays[f"conv{i}_b"] = np.asarray(feats[f"{idx}.bias"], np.float32).reshape(-1)
    for j in range(5):
        w = np.asarray(heads[f"lin{j}.model.1.weight"], np.float32)
        arrays[f"lin{j}"] = np.maximum(w.reshape(-1), 0.0)
    np.savez(out_path, **arrays)
    print(f"wrote {out_path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch", action="store_true", dest="use_torch")
    p.add_argument("--elpips_dir", default=None)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    if args.use_torch:
        from_torch(args.out)
    elif args.elpips_dir:
        from_elpips(args.elpips_dir, args.out)
    else:
        p.error("pass --torch or --elpips_dir")


if __name__ == "__main__":
    main()
