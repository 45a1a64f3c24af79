"""Generate instant-ngp transforms.json camera files for capture rigs.

Behavioral parity target: reference scripts/make_transforms.py — synthesizes
camera trajectories (look-at spirals, two-axis rotation-stage grids) as
transforms_{train,test}.json consumed by the dataset loaders and the
Mitsuba/simulation tooling.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def look_at(position, target, up=(0.0, 0.0, 1.0)):
    """Camera-to-world with -z looking from position toward target (OpenGL)."""
    position = np.asarray(position, np.float64)
    forward = position - np.asarray(target, np.float64)  # camera -z = -forward
    forward = forward / np.linalg.norm(forward)
    right = np.cross(np.asarray(up, np.float64), forward)
    right = right / np.linalg.norm(right)
    true_up = np.cross(forward, right)
    m = np.eye(4)
    m[:3, 0] = right
    m[:3, 1] = true_up
    m[:3, 2] = forward
    m[:3, 3] = position
    return m


def rodrigues_rotation(axis, theta):
    """Rotation matrix about `axis` by `theta` (make_transforms.py:146)."""
    n = np.asarray(axis, np.float64)
    n = n / np.linalg.norm(n)
    k = np.array([[0, -n[2], n[1]], [n[2], 0, -n[0]], [-n[1], n[0], 0]])
    return np.eye(3) + np.sin(theta) * k + (1 - np.cos(theta)) * (k @ k)


def transforms_spiral(starting_point, ending_point, target_point, n_views,
                      camera_angle_x=0.6911112070083618):
    """Spiral of look-at cameras between two points (make_transforms.py:37)."""
    start = np.asarray(starting_point, np.float64)
    end = np.asarray(ending_point, np.float64)
    frames = []
    for i in range(n_views):
        a = i / max(n_views - 1, 1)
        theta = 2 * np.pi * a
        center = start * (1 - a) + end * a
        radius = 0.15 * np.linalg.norm(end - start)
        offset = radius * np.array([np.cos(theta), np.sin(theta), 0.0])
        pose = look_at(center + offset, target_point)
        frames.append({
            "file_path": f"frames/r_{i}",
            "transform_matrix": pose.tolist(),
        })
    return {"camera_angle_x": camera_angle_x, "frames": frames}


def transforms_rot_stage(x_rots, y_rots, x_rot_deg, y_rot_deg,
                         camera_position, target_point,
                         camera_angle_x=0.6911112070083618):
    """Two-axis rotation-stage grid of poses (make_transforms.py:152)."""
    frames = []
    base = np.asarray(camera_position, np.float64)
    target = np.asarray(target_point, np.float64)
    idx = 0
    for ix in range(x_rots):
        rx = rodrigues_rotation(
            [1.0, 0, 0], np.deg2rad((ix - (x_rots - 1) / 2) * x_rot_deg)
        )
        for iy in range(y_rots):
            ry = rodrigues_rotation(
                [0.0, 0, 1.0], np.deg2rad((iy - (y_rots - 1) / 2) * y_rot_deg)
            )
            position = target + ry @ rx @ (base - target)
            pose = look_at(position, target)
            frames.append({
                "file_path": f"frames/r_{idx}",
                "transform_matrix": pose.tolist(),
            })
            idx += 1
    return {"camera_angle_x": camera_angle_x, "frames": frames}


def save_train_test_json(meta, out_dir, test_every=8):
    """Split frames by index and write transforms_{train,test}.json."""
    os.makedirs(out_dir, exist_ok=True)
    train = dict(meta, frames=[
        f for i, f in enumerate(meta["frames"]) if i % test_every != 0
    ])
    test = dict(meta, frames=[
        f for i, f in enumerate(meta["frames"]) if i % test_every == 0
    ])
    with open(os.path.join(out_dir, "transforms_train.json"), "w") as f:
        json.dump(train, f, indent=2)
    with open(os.path.join(out_dir, "transforms_test.json"), "w") as f:
        json.dump(test, f, indent=2)
    return train, test


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=("spiral", "rot_stage"), default="spiral")
    parser.add_argument("--out", required=True)
    parser.add_argument("--n_views", type=int, default=64)
    parser.add_argument("--start", type=float, nargs=3, default=[3, 0, 1])
    parser.add_argument("--end", type=float, nargs=3, default=[0, 3, 1])
    parser.add_argument("--target", type=float, nargs=3, default=[0, 0, 0])
    parser.add_argument("--x_rots", type=int, default=5)
    parser.add_argument("--y_rots", type=int, default=8)
    parser.add_argument("--x_rot_deg", type=float, default=10.0)
    parser.add_argument("--y_rot_deg", type=float, default=12.0)
    parser.add_argument("--camera_position", type=float, nargs=3, default=[3, 0, 1])
    parser.add_argument("--test_every", type=int, default=8)
    args = parser.parse_args()

    if args.mode == "spiral":
        meta = transforms_spiral(args.start, args.end, args.target, args.n_views)
    else:
        meta = transforms_rot_stage(
            args.x_rots, args.y_rots, args.x_rot_deg, args.y_rot_deg,
            args.camera_position, args.target,
        )
    save_train_test_json(meta, args.out, args.test_every)
    print(f"wrote {len(meta['frames'])} poses to {args.out}")


if __name__ == "__main__":
    main()
