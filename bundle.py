"""Bundle per-frame transient h5 volumes into the flattened training stream.

Behavioral parity target: reference bundle.py — produces the
train_efficient/{samples,x,y,file_indices}.h5 files that the transient
loaders (data/datasets.py TransientSimulation/FWPTransientCaptured) stream
contiguous batches from. Pixels across all training frames are shuffled once
at bundle time so contiguous reads are i.i.d. samples.

Usage:
    python bundle.py --path_to_h5s DATA --output_path DATA/train_efficient \
        --train_json_path DATA/transforms_train.json
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def bundle_rays(path_to_h5s: str, output_path: str, train_json_path: str,
                seed: int = 0):
    import h5py

    from neural_radiance_caching_tpu.data.io import read_h5

    with open(train_json_path) as fp:
        meta = json.load(fp)
    train_fnames = [
        os.path.splitext(frame["file_path"])[0] + ".h5"
        for frame in meta["frames"]
    ]

    first = read_h5(os.path.join(path_to_h5s, train_fnames[0]))
    h, w, bins = first.shape[:3]
    channels = first.shape[3] if first.ndim == 4 else 1
    n = len(train_fnames)

    data = np.zeros((h * w * n, bins, channels), np.float32)
    xs = np.zeros(h * w * n, np.float32)
    ys = np.zeros(h * w * n, np.float32)
    file_idx = np.zeros(h * w * n, np.float32)

    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    for ind, fname in enumerate(train_fnames):
        print("Bundling:", fname)
        frames = read_h5(os.path.join(path_to_h5s, fname))
        frames = frames.reshape(-1, bins, channels if frames.ndim == 4 else 1)
        sl = slice(ind * h * w, (ind + 1) * h * w)
        data[sl] = frames[..., :channels]
        xs[sl] = gx.reshape(-1)
        ys[sl] = gy.reshape(-1)
        file_idx[sl] = ind

    p = np.random.RandomState(seed).permutation(data.shape[0])
    data, xs, ys, file_idx = data[p], xs[p], ys[p], file_idx[p]

    os.makedirs(output_path, exist_ok=True)
    for name, arr in (("samples", data), ("x", xs), ("y", ys),
                      ("file_indices", file_idx)):
        with h5py.File(os.path.join(output_path, f"{name}.h5"), "w") as f:
            f.create_dataset("dataset", data=arr, dtype="f")
    print("Wrote", output_path)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path_to_h5s", "--pathToH5s", dest="path_to_h5s",
                        required=True)
    parser.add_argument("--output_path", "--outputPath", dest="output_path",
                        required=True)
    parser.add_argument("--train_json_path", "--trainJsonPath",
                        dest="train_json_path", required=True)
    args = parser.parse_args()
    bundle_rays(args.path_to_h5s, args.output_path, args.train_json_path)


if __name__ == "__main__":
    main()
