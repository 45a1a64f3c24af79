"""Calibrate transient shift + light position from captured depths.

Behavioral parity target: reference internal/transient_utils.py
(optimize_shift_light_pos :284-313, get_patch :314-321,
solve_shift_light_source_one_view :323-368): given scene points (from
camera rays x depth) and measured total photon path distances, solve

    total_distance ≈ depth + shift + ||scene_point - light_pos||

for the global temporal shift and the 3D light position. Uses scipy
least_squares instead of the reference's torch LBFGS loop.
"""

from __future__ import annotations

import argparse

import numpy as np


def optimize_shift_light_pos(scene_points, depth, total_distance,
                             x0=(9.9064, 0.9608, -4.8817, 0.3775)):
    """Solve for (shift, light_x, light_y, light_z) by least squares."""
    from scipy.optimize import least_squares

    scene_points = np.asarray(scene_points, np.float64).reshape(-1, 3)
    depth = np.asarray(depth, np.float64).reshape(-1)
    total_distance = np.asarray(total_distance, np.float64).reshape(-1)

    def residual(x):
        shift, light_pos = x[0], x[1:]
        light_dist = np.linalg.norm(scene_points - light_pos[None], axis=-1)
        return total_distance - (depth + shift + light_dist)

    result = least_squares(residual, np.asarray(x0, np.float64))
    return result.x, float(0.5 * np.sum(result.fun**2))


def get_patch(origins, viewdirs, total_distance, depth, patch):
    """Crop rays/depth/total-distance to an image patch and lift to 3D."""
    i0, i1, j0, j1 = patch
    o = origins[i0:i1, j0:j1]
    d = depth[i0:i1, j0:j1]
    vdir = viewdirs[i0:i1, j0:j1]
    td = total_distance[i0:i1, j0:j1]
    scene_points = d[..., None] * vdir + o
    return scene_points.reshape(-1, 3), d.reshape(-1), td.reshape(-1)


def solve_from_views(view_data, patches_per_view, median_filter=True):
    """Aggregate patches across views then solve (transient_utils.py:323-368).

    view_data: list of dicts with origins/viewdirs [H,W,3], depth [H,W],
      total_distance [H,W]. patches_per_view: list of patch tuples per view.
    """
    from scipy.signal import medfilt2d

    pts, ds, tds = [], [], []
    for data, patches in zip(view_data, patches_per_view):
        depth = data["depth"]
        td = data["total_distance"]
        if median_filter:
            depth = medfilt2d(np.asarray(depth, np.float64), kernel_size=3)
            td = medfilt2d(np.asarray(td, np.float64), kernel_size=3)
        for patch in patches:
            sp, d, t = get_patch(
                data["origins"], data["viewdirs"], td, depth, patch
            )
            pts.append(sp)
            ds.append(d)
            tds.append(t)
    return optimize_shift_light_pos(
        np.concatenate(pts), np.concatenate(ds), np.concatenate(tds)
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene_points", required=True, help=".npy [N,3]")
    parser.add_argument("--depth", required=True, help=".npy [N]")
    parser.add_argument("--total_distance", required=True, help=".npy [N]")
    args = parser.parse_args()
    x, err = optimize_shift_light_pos(
        np.load(args.scene_points), np.load(args.depth),
        np.load(args.total_distance),
    )
    print(f"shift={x[0]:.6f} light_pos=({x[1]:.6f}, {x[2]:.6f}, {x[3]:.6f}) "
          f"residual={err:.6g}")


if __name__ == "__main__":
    main()
