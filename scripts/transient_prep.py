"""Offline prep toolkit for captured/simulated transient datasets.

Behavioral parity targets in the reference tree (all re-expressed, vectorized
numpy instead of per-bin python loops / torch device code):

- depth from total photon path length:
  scripts/transient_utils_no_torch.py:343-350 (`get_depth_from_distance_eq`,
  closed-form bistatic solve) and :313-341 (`get_depth_from_distance_optim`,
  the LBFGS refinement — here a scipy least-squares fallback for pixels where
  the closed form is ill-conditioned).
- temporal shift of measured transients:
  scripts/transient_utils_no_torch.py:534-553
  (`shift_transient_grid_sample_3d`: linear interpolation along the bin axis,
  zeros shifted in from out of range).
- spatial downsample + shift of a training dir:
  scripts/transient_utils_no_torch.py:513-532 (`downsample_shift_transients`).
- dToF -> CW-iToF synthesis: scripts/transient_utils_no_torch.py:836-877
  (`direct_tof_to_cw_tof` / `make_ctof_dataset`): correlate the transient
  against cos(2*pi*f*t + phase) per requested phase shift.

The reference versions hardcode cluster paths and loop per time bin; this
tool takes paths as arguments and correlates via one einsum.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

SPEED_OF_LIGHT = 299792458.0


# ---------------------------------------------------------------------------
# Depth from total path distance (bistatic time-of-flight geometry).
# ---------------------------------------------------------------------------

def depth_from_total_distance(total_dist, light_pos, viewdirs, origins):
    """Closed-form per-pixel depth d solving

        total_dist = d + || origins + d * viewdirs - light_pos ||

    (camera-to-surface leg plus surface-to-light leg). Squaring the light leg
    gives a linear equation in d because ||viewdirs|| = 1:

        (b - d v) . (b - d v) = (total - d)^2,  b = light_pos - origins
        => d = (b.b - total^2) / (2 v.b - 2 total)

    Parity: transient_utils_no_torch.py:343-350. Negative roots (behind the
    camera) clamp to 0 as the reference does.
    """
    total_dist = np.asarray(total_dist, np.float64)
    b = np.asarray(light_pos, np.float64) - np.asarray(origins, np.float64)
    v = np.asarray(viewdirs, np.float64)
    denom = 2.0 * np.sum(v * b, axis=-1) - 2.0 * total_dist
    num = np.sum(b * b, axis=-1) - total_dist**2
    with np.errstate(divide="ignore", invalid="ignore"):
        d = np.where(np.abs(denom) > 1e-12, num / denom, 0.0)
    return np.clip(d, 0.0, None)


def refine_depth_least_squares(total_dist, light_pos, viewdirs, origins,
                               init_depth=None):
    """Iterative refinement of the depth solve (parity with the reference's
    LBFGS variant, transient_utils_no_torch.py:313-341) for noisy captures.

    Minimizes 0.5 * sum (total - (d + light_leg(d)))^2 over per-pixel d >= 0.
    The residual is separable per pixel, so Gauss-Newton on the flat vector
    converges in a few sweeps without scipy's full machinery.
    """
    total = np.asarray(total_dist, np.float64).reshape(-1)
    v = np.asarray(viewdirs, np.float64).reshape(-1, 3)
    o = np.asarray(origins, np.float64).reshape(-1, 3)
    lp = np.asarray(light_pos, np.float64).reshape(3)
    d = (np.asarray(init_depth, np.float64).reshape(-1).copy()
         if init_depth is not None else np.ones_like(total))
    for _ in range(50):
        pts = o + d[:, None] * v
        diff = pts - lp[None]
        leg = np.linalg.norm(diff, axis=-1)
        resid = total - (d + leg)
        # d/dd [d + ||o + d v - lp||] = 1 + v.(pts - lp)/leg
        grad = 1.0 + np.sum(v * diff, axis=-1) / np.maximum(leg, 1e-12)
        step = resid / np.maximum(grad, 1e-6)
        d = np.clip(d + step, 0.0, None)
        if np.max(np.abs(step)) < 1e-10:
            break
    return d.reshape(np.asarray(total_dist).shape)


# ---------------------------------------------------------------------------
# Temporal shift / rebinning.
# ---------------------------------------------------------------------------

def shift_transient(transient, shift_val, exposure_time):
    """Shift a transient EARLIER by `shift_val` (distance units) along its
    bin axis with linear interpolation; zeros flow in past the end.

    transient: [..., n_bins, C]. Matches the grid_sample semantics of
    transient_utils_no_torch.py:534-553: output bin t reads input bin
    t + shift/exposure_time (out-of-range -> 0).
    """
    transient = np.asarray(transient)
    n_bins = transient.shape[-2]
    src = np.arange(n_bins, dtype=np.float64) + float(shift_val) / float(exposure_time)
    lo = np.floor(src).astype(np.int64)
    frac = (src - lo).astype(transient.dtype)
    hi = lo + 1
    valid_lo = (lo >= 0) & (lo < n_bins)
    valid_hi = (hi >= 0) & (hi < n_bins)
    lo_c = np.clip(lo, 0, n_bins - 1)
    hi_c = np.clip(hi, 0, n_bins - 1)
    take_lo = np.take(transient, lo_c, axis=-2) * valid_lo[:, None]
    take_hi = np.take(transient, hi_c, axis=-2) * valid_hi[:, None]
    return take_lo * (1.0 - frac[:, None]) + take_hi * frac[:, None]


def downsample_and_shift(transient, downsample_factor, shift_val,
                         exposure_time, n_bins=None):
    """Spatially decimate an [H, W, T, C] (or [H, W, T]) transient by
    repeated stride-2 slicing, then remove the calibrated temporal shift.

    Parity: transient_utils_no_torch.py:513-532 — the reference strides
    [::2, ::2] log2(factor) times (decimation, not averaging) and then
    applies the grid-sample shift.
    """
    transient = np.asarray(transient)
    squeeze_c = transient.ndim == 3
    if squeeze_c:
        transient = transient[..., None]
    if n_bins is not None:
        transient = transient[..., :n_bins, :]
    times = int(np.log2(downsample_factor))
    if 2**times != downsample_factor:
        raise ValueError(f"downsample_factor must be a power of 2, got {downsample_factor}")
    for _ in range(times):
        transient = transient[::2, ::2]
    out = shift_transient(transient, shift_val, exposure_time)
    return out[..., 0] if squeeze_c else out


# ---------------------------------------------------------------------------
# dToF -> CW-iToF synthesis.
# ---------------------------------------------------------------------------

def direct_tof_to_cw_tof(direct_tof, frequency, exposure_time, phase_shifts):
    """Correlate a direct time-of-flight transient against a CW modulation.

    direct_tof: [H, W, T, C]; returns [H, W, len(phase_shifts), C] where
    entry p is sum_t transient[t] * cos(2*pi*f*(t*exposure/c) + phase_p).
    Parity: transient_utils_no_torch.py:836-853 (per-bin loop there; one
    einsum here).
    """
    direct_tof = np.asarray(direct_tof, np.float32)
    n_bins = direct_tof.shape[-2]
    t = np.arange(n_bins, dtype=np.float64) * float(exposure_time) / SPEED_OF_LIGHT
    phases = (2.0 * np.pi * float(frequency) * t)[None, :] + np.asarray(
        phase_shifts, np.float64)[:, None]
    basis = np.cos(phases).astype(np.float32)  # [P, T]
    return np.einsum("hwtc,pt->hwpc", direct_tof, basis)


DEFAULT_PHASE_SHIFTS = (0.0, np.pi / 2, np.pi, 3 * np.pi / 2)

# Per-scene CW settings from the reference's make_ctof_dataset
# (transient_utils_no_torch.py:855-862).
CTOF_SCENE_SETTINGS = {
    "kitchen": {"exposure_time": 0.02, "freq": 30e6},
    "cornell": {"exposure_time": 0.01, "freq": 75e6},
    "peppers": {"exposure_time": 0.02, "freq": 30e6},
    "pots": {"exposure_time": 0.01, "freq": 75e6},
}


def _read_h5(path):
    import h5py

    with h5py.File(path, "r") as f:
        key = "data" if "data" in f else list(f.keys())[0]
        return np.asarray(f[key])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("ctof", help="synthesize CW-iToF .npy files from dToF H5s")
    c.add_argument("input_dir")
    c.add_argument("output_dir")
    c.add_argument("--frequency", type=float, required=True)
    c.add_argument("--exposure-time", type=float, required=True)
    c.add_argument("--phase-shifts", type=float, nargs="+",
                   default=list(DEFAULT_PHASE_SHIFTS))

    d = sub.add_parser("downsample", help="decimate + unshift training transients")
    d.add_argument("input_dir")
    d.add_argument("output_dir")
    d.add_argument("--factor", type=int, default=4)
    d.add_argument("--shift", type=float, required=True)
    d.add_argument("--exposure-time", type=float, required=True)
    d.add_argument("--n-bins", type=int, default=None)

    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    for name in sorted(os.listdir(args.input_dir)):
        if not name.endswith(".h5"):
            continue
        data = _read_h5(os.path.join(args.input_dir, name))
        if args.cmd == "ctof":
            out = direct_tof_to_cw_tof(data[..., :3], args.frequency,
                                       args.exposure_time, args.phase_shifts)
        else:
            out = downsample_and_shift(np.squeeze(data), args.factor,
                                       args.shift, args.exposure_time,
                                       n_bins=args.n_bins)
        np.save(os.path.join(args.output_dir, name[:-3] + ".npy"), out)
        print(f"{name}: {data.shape} -> {out.shape}")


if __name__ == "__main__":
    main()
