"""Generate per-view Mitsuba scene XMLs from a transforms JSON.

Behavioral parity target: reference internal/mitsuba_create_xmls.py — takes
a template Mitsuba scene XML and a transforms_{split}.json, and writes one
XML per frame with the sensor (and optional emitter) transform set to that
frame's camera pose (axis-flipped from NGP/OpenGL to Mitsuba convention),
for rendering simulated (transient) ground truth.
"""

from __future__ import annotations

import argparse
import json
import os
from xml.etree import ElementTree

import numpy as np

# NGP/OpenGL -> Mitsuba axis convention (mitsuba_create_xmls.py:82-88).
AX_FLIP = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]], dtype=np.float64
)


def pose_to_mitsuba_matrix(transform_matrix):
    tm = np.array(transform_matrix, np.float64)
    trans = AX_FLIP @ tm
    trans[:, 2] *= -1
    trans[:, 0] *= -1
    return ", ".join(str(x) for x in trans.flatten())


def _set_matrix_everywhere(root, value):
    """Set every <matrix> under sensor/emitter <transform> nodes."""
    count = 0
    for parent in root.iter():
        if parent.tag in ("sensor", "emitter"):
            for transform in parent.iter("transform"):
                for matrix in transform.iter("matrix"):
                    matrix.attrib["value"] = value
                    count += 1
    return count


def gen_xmls(template_path, json_path, target_path, spp=4096, res=64):
    """One Mitsuba XML per frame (mitsuba_create_xmls.py:54-100)."""
    with open(json_path) as f:
        positions = json.load(f)
    os.makedirs(target_path, exist_ok=True)

    written = []
    for pos in positions["frames"]:
        tree = ElementTree.parse(template_path)
        root = tree.getroot()
        # Update spp / film resolution defaults when present.
        for default in root.iter("default"):
            name = default.attrib.get("name", "")
            if name in ("spp",):
                default.attrib["value"] = str(spp)
            elif name in ("resx", "resy", "width", "height"):
                default.attrib["value"] = str(res)
        value = pose_to_mitsuba_matrix(pos["transform_matrix"])
        n = _set_matrix_everywhere(root, value)
        if n == 0:
            raise ValueError("template has no sensor/emitter <matrix> nodes")
        stem = os.path.splitext(os.path.basename(pos["file_path"]))[0]
        out = os.path.join(target_path, f"{stem}.xml")
        tree.write(out)
        written.append(out)
    return written


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--template", required=True)
    parser.add_argument("--json_path", required=True)
    parser.add_argument("--target_path", required=True)
    parser.add_argument("--spp", type=int, default=4096)
    parser.add_argument("--res", type=int, default=64)
    args = parser.parse_args()
    out = gen_xmls(args.template, args.json_path, args.target_path,
                   spp=args.spp, res=args.res)
    print(f"wrote {len(out)} scene XMLs to {args.target_path}")


if __name__ == "__main__":
    main()
