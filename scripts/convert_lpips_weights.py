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


# torch-lpips `LPIPS(net='vgg').state_dict()` key schema: the vgg16 wrapper
# keeps torchvision's original feature indices as module names inside five
# slices (slice1 = features[0:4], slice2 = [4:9], slice3 = [9:16],
# slice4 = [16:23], slice5 = [23:30]), and the heads live at
# lin{j}.model.1.weight with shape [1, C, 1, 1].
TORCH_SLICE_RANGES = ((0, 4), (4, 9), (9, 16), (16, 23), (23, 30))


def _slice_of(idx):
    for s, (lo, hi) in enumerate(TORCH_SLICE_RANGES, start=1):
        if lo <= idx < hi:
            return s
    raise ValueError(f"feature index {idx} outside VGG16 conv range")


def convert_torch_arrays(conv_oihw, lin_heads):
    """Pure conversion: torch-layout arrays -> the .npz array dict.

    conv_oihw: {feature_idx: (weight OIHW, bias)} for the 13 VGG16 convs.
    lin_heads: {j: weight [1, C, 1, 1]} for the 5 LPIPS linear heads.
    """
    arrays = {}
    for i, idx in enumerate(TORCH_CONV_IDX):
        w, b = conv_oihw[idx]
        arrays[f"conv{i}_w"] = np.asarray(w, np.float32).transpose(2, 3, 1, 0)
        arrays[f"conv{i}_b"] = np.asarray(b, np.float32).reshape(-1)
    for j in range(5):
        w = np.asarray(lin_heads[j], np.float32)
        # LPIPS heads are 1x1 convs with non-negative weights by construction.
        arrays[f"lin{j}"] = np.maximum(w.reshape(-1), 0.0)
    return arrays


def from_torch_checkpoint(ckpt_path, out_path):
    """Convert a torch.save()d `lpips.LPIPS(net='vgg').state_dict()` file."""
    import torch

    state = torch.load(ckpt_path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    conv_oihw = {}
    for idx in TORCH_CONV_IDX:
        prefix = f"net.slice{_slice_of(idx)}.{idx}"
        conv_oihw[idx] = (
            state[f"{prefix}.weight"].numpy(),
            state[f"{prefix}.bias"].numpy(),
        )
    lin_heads = {
        j: state[f"lin{j}.model.1.weight"].numpy() for j in range(5)
    }
    np.savez(out_path, **convert_torch_arrays(conv_oihw, lin_heads))
    print(f"wrote {out_path}")


def from_torch(out_path):
    import lpips as lpips_pkg  # noqa: F401  (pulls the linear-head weights)
    import torch  # noqa: F401
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    conv_oihw = {
        idx: (vgg[idx].weight.detach().numpy(), vgg[idx].bias.detach().numpy())
        for idx in TORCH_CONV_IDX
    }
    net = lpips_pkg.LPIPS(net="vgg")
    lin_heads = {
        j: lin.model[-1].weight.detach().numpy() for j, lin in enumerate(net.lins)
    }
    np.savez(out_path, **convert_torch_arrays(conv_oihw, lin_heads))
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
    p.add_argument("--torch_checkpoint", default=None,
                   help="path to a torch.save()d lpips.LPIPS(net='vgg') state_dict")
    p.add_argument("--elpips_dir", default=None)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    if args.use_torch:
        from_torch(args.out)
    elif args.torch_checkpoint:
        from_torch_checkpoint(args.torch_checkpoint, args.out)
    elif args.elpips_dir:
        from_elpips(args.elpips_dir, args.out)
    else:
        p.error("pass --torch, --torch_checkpoint, or --elpips_dir")


if __name__ == "__main__":
    main()
