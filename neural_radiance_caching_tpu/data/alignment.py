"""Camera pose alignment (Procrustes) for camera-optimized evaluation.

Behavioral parity target: reference internal/alignment.py (procrustes
:168-190, transform builders :193-210, compute_procrusted_aligned_cameras
:224-254) — when training optimizes cameras, test cameras must be mapped
into the optimized coordinate frame via the similarity transform that best
aligns GT train positions to their optimized counterparts.
"""

from __future__ import annotations

import numpy as np


def procrustes(p1, p2):
    """Orthogonal Procrustes between point sets [N,3] (alignment.py:168-190).

    Returns (s1, s2, p1_mean, p2_mean, r) with x1 ≈ x2 @ r.T after each set
    is centered and scale-normalized.
    """
    p1 = np.asarray(p1)
    p2 = np.asarray(p2)
    p1_mean = p1.mean(axis=0)
    p2_mean = p2.mean(axis=0)
    s1 = np.sqrt(np.sum((p1 - p1_mean) ** 2))
    s2 = np.sqrt(np.sum((p2 - p2_mean) ** 2))
    x1 = (p1 - p1_mean) / s1
    x2 = (p2 - p2_mean) / s2
    u, _, vt = np.linalg.svd(x1.T @ x2)
    r = u @ vt
    if r[0, 0] < 0:
        r = r @ np.diag([-1.0, 1, 1])
    if r[1, 1] < 0:
        r = r @ np.diag([1.0, -1, 1])
    if r[2, 2] < 0:
        r = r @ np.diag([1.0, 1, -1])
    return s1, s2, p1_mean, p2_mean, r


def translation_transform(t):
    result = np.eye(4)
    result[:3, 3] = t
    return result


def rotation_transform(r):
    result = np.eye(4)
    result[:3, :3] = r
    return result


def scale_transform(s):
    return np.diag([s, s, s, 1.0])


def similarity_from_point_sets(positions_opt, positions_gt):
    """4x4 similarity mapping the GT frame into the optimized frame
    (alignment.py:236-245)."""
    opt_scale, gt_scale, opt_mean, gt_mean, rotation = procrustes(
        positions_opt, positions_gt
    )
    return (
        translation_transform(opt_mean)
        @ scale_transform(opt_scale)
        @ rotation_transform(rotation)
        @ scale_transform(1 / gt_scale)
        @ translation_transform(-gt_mean)
    )


def transform_poses(camtoworlds, transform):
    """Apply a 4x4 similarity to [N,3,4] camera-to-world poses."""
    camtoworlds = np.asarray(camtoworlds)
    rot = transform[:3, :3]
    scale = np.cbrt(np.abs(np.linalg.det(rot)))
    rot_unit = rot / scale
    out = camtoworlds.copy()
    out[:, :3, :3] = rot_unit @ camtoworlds[:, :3, :3]
    out[:, :3, 3] = camtoworlds[:, :3, 3] @ rot.T + transform[:3, 3]
    return out


def compute_procrustes_aligned_poses(train_poses_opt, train_poses_gt,
                                     test_poses):
    """Map GT train + test poses into the optimized frame
    (alignment.py:224-254)."""
    transform = similarity_from_point_sets(
        np.asarray(train_poses_opt)[:, :3, 3], np.asarray(train_poses_gt)[:, :3, 3]
    )
    return (
        transform_poses(train_poses_gt, transform),
        transform_poses(test_poses, transform),
    )
