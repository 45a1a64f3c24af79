"""Apply sensor response models to simulated transient volumes.

Behavioral parity target: reference scripts/sensor_responses.py — converts
ideal time-resolved renders (h5 volumes [H, W, T, C]) into sensor-domain
measurements: pulsed-laser temporal convolution, continuous-wave ToF phase
projections, or constant (steady-state) integration; writes the processed
volumes back out for the transient_simulation loaders.

Usage:
    python scripts/sensor_responses.py --input scene/frames --output out \
        --mode pulse --pulse_sigma 2.5
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def read_h5(path):
    import h5py

    with h5py.File(path, "r") as f:
        return np.array(f["data"]).astype(np.float32)


def write_h5(path, data):
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data.astype(np.float32), dtype="f")


def gaussian_pulse(sigma, radius=None):
    radius = radius or int(np.ceil(3 * sigma))
    t = np.arange(-radius, radius + 1)
    pulse = np.exp(-0.5 * (t / sigma) ** 2)
    return pulse / pulse.sum()


def apply_pulse_response(transient_data, pulse):
    """Convolve each pixel's time profile with the laser pulse
    (sensor_responses.py:48-61)."""
    h, w, t = transient_data.shape[:3]
    c = transient_data.shape[3] if transient_data.ndim == 4 else 1
    flat = transient_data.reshape(h * w, t, -1)
    out = np.empty_like(flat)
    for ch in range(flat.shape[-1]):
        out[..., ch] = np.apply_along_axis(
            lambda x: np.convolve(x, pulse, mode="same"), 1, flat[..., ch]
        )
    return out.reshape(transient_data.shape)


def apply_cw_tof_response(transient_data, phase_shifts, frequency=6.0,
                          exposure_time=0.01):
    """Project transients onto CW-ToF phase measurements
    (sensor_responses.py:64-82): for each phase phi, integrate
    I(t)·cos(2*pi*f*t + phi) over time."""
    t = transient_data.shape[2]
    times = np.arange(t) * exposure_time
    outs = []
    for phi in phase_shifts:
        carrier = np.cos(2 * np.pi * frequency * times + phi)
        outs.append(
            np.tensordot(transient_data, carrier, axes=([2], [0]))
        )
    return np.stack(outs, axis=2)  # [H, W, n_phases, C]


def apply_constant_response(transient_data):
    """Steady-state integration over all time bins."""
    return transient_data.sum(axis=2)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="dir of per-frame .h5")
    parser.add_argument("--output", required=True)
    parser.add_argument("--mode", choices=("pulse", "itof", "steady"),
                        default="pulse")
    parser.add_argument("--pulse_sigma", type=float, default=2.5)
    parser.add_argument("--frequency", type=float, default=6.0)
    parser.add_argument("--exposure_time", type=float, default=0.01)
    parser.add_argument("--phase_shifts", type=float, nargs="+",
                        default=[0.0, np.pi / 2, np.pi, 3 * np.pi / 2])
    args = parser.parse_args()

    os.makedirs(args.output, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(args.input, "*.h5"))):
        data = read_h5(path)
        if args.mode == "pulse":
            out = apply_pulse_response(data, gaussian_pulse(args.pulse_sigma))
        elif args.mode == "itof":
            out = apply_cw_tof_response(
                data, args.phase_shifts, args.frequency, args.exposure_time
            )
        else:
            out = apply_constant_response(data)
        write_h5(os.path.join(args.output, os.path.basename(path)), out)
        print("processed", os.path.basename(path), out.shape)


if __name__ == "__main__":
    main()
