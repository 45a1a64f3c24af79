"""Keyframe camera trajectory builder for captured-scene render paths.

Behavioral parity target: reference scripts/trajectory_parametrization.py —
its `Camera`/`Trajectory` classes (:9-226) build a camera path by linear or
sphere (orbit-about-center) interpolation between hand-picked keyframes,
optionally smooth the positions with a fitted parametric curve, and write a
Blender-convention `transforms.json` whose frames hold OpenGL c2w matrices
(:144-163). The per-scene functions there (`jfk_traj`, `coke_smooth_trajectory`,
`kitchen_training`, ... :227-948) are keyframe tables wired to cluster paths;
this tool reads keyframes from a JSON file instead and keeps the math.

Deviation (documented): the reference's `smoothen_trajectory` (:178-226) fits
an ad-hoc 15-parameter bezier-like polynomial with scipy.minimize; here
smoothing is a cubic B-spline fit (scipy.interpolate.splprep) over the
keyframe times — the standard tool for the same intent (a C2 path through
noisy hand-picked positions), without the reference's duplicated-endpoint
quirk (its curve reuses P0 for the t^3 term).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def look_at_c2w(origin, target, up=(0.0, 0.0, 1.0)):
    """OpenGL camera-to-world matrix looking from `origin` at `target`.

    Columns [right, up, -forward, origin] — the convention of the reference's
    Camera.get_extrinsics (trajectory_parametrization.py:20-31).
    """
    origin = np.asarray(origin, np.float64)
    forward = np.asarray(target, np.float64) - origin
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, np.float64))
    right = right / np.linalg.norm(right)
    cam_up = np.cross(right, forward)
    m = np.eye(4)
    m[:3, 0] = right
    m[:3, 1] = cam_up
    m[:3, 2] = -forward
    m[:3, 3] = origin
    return m


def _rotate_about_axis(vec, axis, theta):
    """Rodrigues rotation of `vec` about unit `axis` by `theta`
    (trajectory_parametrization.py:165-168)."""
    axis = np.asarray(axis, np.float64)
    vec = np.asarray(vec, np.float64)
    return (vec * np.cos(theta)
            + np.cross(axis, vec) * np.sin(theta)
            + axis * (axis @ vec) * (1.0 - np.cos(theta)))


def interpolate_linear(k0, k1, num):
    """`num` keyframes blending k0 -> k1 (k1 exclusive), lerping origin,
    target, up, and time (trajectory_parametrization.py:94-100)."""
    out = []
    for i in range(num):
        w = i / num
        out.append({
            f: ((1.0 - w) * np.asarray(k0[f], np.float64)
                + w * np.asarray(k1[f], np.float64))
            for f in ("origin", "target", "up", "time")
        })
    return out


def interpolate_sphere(k0, k1, num, center):
    """Orbit interpolation about `center`: rotate the start offset toward the
    end offset at constant angular rate while lerping the radius; target/up/
    time lerp (trajectory_parametrization.py:101-124)."""
    center = np.asarray(center, np.float64)
    v0 = np.asarray(k0["origin"], np.float64) - center
    v1 = np.asarray(k1["origin"], np.float64) - center
    r0, r1 = np.linalg.norm(v0), np.linalg.norm(v1)
    cosang = np.clip(v0 @ v1 / (r0 * r1), -1.0, 1.0)
    angle = np.arccos(cosang)
    axis = np.cross(v1, v0)
    norm = np.linalg.norm(axis)
    if norm < 1e-12:  # parallel offsets: orbit degenerates to a lerp
        return interpolate_linear(k0, k1, num)
    axis = axis / norm
    out = interpolate_linear(k0, k1, num)
    for i, kf in enumerate(out):
        w = i / num
        direction = _rotate_about_axis(v0, axis, -angle * w)
        direction = direction / np.linalg.norm(direction)
        kf["origin"] = center + ((1.0 - w) * r0 + w * r1) * direction
    return out


def build_trajectory(keyframes, interpolations, center=(0.0, 0.0, 0.0)):
    """Expand keyframes with per-segment ("linear"|"sphere", count) specs —
    the reference Trajectory.compute_trajectory (:71-91): each keyframe is
    emitted, followed by its interpolated segment."""
    traj = []
    for i, kf in enumerate(keyframes):
        traj.append({f: np.asarray(kf[f], np.float64) for f in
                     ("origin", "target", "up", "time")})
        if i < len(keyframes) - 1:
            kind, num = interpolations[i]
            seg = (interpolate_sphere(kf, keyframes[i + 1], num, center)
                   if kind == "sphere"
                   else interpolate_linear(kf, keyframes[i + 1], num))
            traj.extend(seg)
    return traj


def smooth_positions(trajectory, smoothing=0.0):
    """Replace origins with a cubic B-spline fit over normalized keyframe
    time (see module docstring for the deviation from the reference's
    ad-hoc polynomial)."""
    from scipy.interpolate import splev, splprep

    pts = np.stack([kf["origin"] for kf in trajectory], axis=0)
    t = np.asarray([float(kf["time"]) for kf in trajectory])
    t = (t - t.min()) / max(t.max() - t.min(), 1e-12)
    # splprep needs strictly increasing parameters; nudge ties.
    t = t + np.arange(len(t)) * 1e-9
    k = min(3, len(trajectory) - 1)
    tck, _ = splprep(pts.T, u=t, s=smoothing * len(trajectory), k=k)
    fitted = np.stack(splev(t, tck), axis=-1)
    for kf, origin in zip(trajectory, fitted):
        kf["origin"] = origin
    return trajectory


def save_transforms(path, trajectory, camera_angle_x=0.69097585,
                    file_pattern="{:04d}.h5"):
    """Write the Blender-convention transforms JSON the loaders consume
    (trajectory_parametrization.py:144-163)."""
    frames = []
    for i, kf in enumerate(trajectory):
        c2w = look_at_c2w(kf["origin"], kf["target"], kf["up"])
        frames.append({"file_path": file_pattern.format(i),
                       "transform_matrix": c2w.tolist()})
    payload = {"camera_angle_x": camera_angle_x, "frames": frames}
    with open(path, "w") as f:
        f.write(json.dumps(payload, indent=4))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("keyframes_json",
                   help="JSON: {keyframes: [{origin, target, up, time}...], "
                        "interpolations: [[kind, count]...], center: [x,y,z]}")
    p.add_argument("output_json")
    p.add_argument("--smooth", type=float, default=None,
                   help="B-spline smoothing factor (omit to keep raw path)")
    p.add_argument("--camera-angle-x", type=float, default=0.69097585)
    args = p.parse_args(argv)

    with open(args.keyframes_json) as f:
        spec = json.load(f)
    traj = build_trajectory(spec["keyframes"], spec["interpolations"],
                            center=spec.get("center", (0.0, 0.0, 0.0)))
    if args.smooth is not None:
        traj = smooth_positions(traj, smoothing=args.smooth)
    save_transforms(args.output_json, traj,
                    camera_angle_x=args.camera_angle_x)
    print(f"wrote {len(traj)} frames -> {args.output_json}")


if __name__ == "__main__":
    main()
