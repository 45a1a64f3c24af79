"""Port the reference's published scene configs into configs/.

The gin files are hyperparameter tables — the values ARE the benchmark spec,
so they are carried over unchanged. What this port normalizes:

  * data_dir: the reference hardcodes the authors' cluster scratch paths;
    rewritten to the /data/<family>/<scene> convention used by
    scripts/train_one_stage.py.
  * dead bindings: the reference binds six NeRFMLP params that do not exist
    on its own NeRFMLP either (emission_activation, emission_bias,
    occ_activation, occ_bias, use_person_lfs, use_separate_surface_lfs);
    this framework's gin engine rejects unknown params at construction, so
    those lines are dropped with an inline note.
  * base configs that already exist here (ngp_yobo.gin, nerf_ngp_yobo.gin,
    trainer.gin, and existing scenes) are left untouched.

Usage: python scripts/port_reference_configs.py [--write]
"""

import os
import re
import sys

REF = "/root/reference/configs"
OUT = "configs"

# Bindings that exist in no implementation (reference or this one).
DEAD_BINDINGS = re.compile(
    r"^NeRFMLP\.(emission_activation|emission_bias|occ_activation|occ_bias|"
    r"use_person_lfs|use_separate_surface_lfs)\b"
)

# Map the authors' scratch paths to the local data convention.
DATA_DIR_RE = re.compile(r'^(Config\.data_dir\s*=\s*)["\'](.+)["\']')

SKIP = {
    # already hand-written in this repo
    "ngp_yobo.gin",
    "nerf_ngp_yobo.gin",
    "nerf_ngp_yobo_hotdog.gin",
    "nerf_ngp_yobo_lego.gin",
    "trainer.gin",
    "CHANGES",
}

FAMILY_DATA_ROOT = {
    "nerf": "/data/tensoir",
    "blender": "/data/nerf_synthetic",
    "open": "/data/openillumination",
    "nero": "/data/nero/GlossySynthetic",
    "glossy": "/data/nero/GlossyReal",
    "orb": "/data/orb",
    "neilf": "/data/neilf",
    "real": "/data/real",
    "synthetic": "/data/fipt/indoor_synthetic",
    "transient": "/data/yobo/final_simulated",
}


def rewrite_data_dir(line, fname):
    m = DATA_DIR_RE.match(line.strip())
    if not m:
        return line
    old_path = m.group(2)
    scene = os.path.basename(old_path.rstrip("/"))
    family = fname.split("_")[0]
    root = FAMILY_DATA_ROOT.get(family, "/data")
    if "captured" in old_path or "fwp" in fname:
        root = "/data/yobo/captured"
    return f'Config.data_dir = "{root}/{scene}"\n'


def port_file(fname, write):
    src = os.path.join(REF, fname)
    dst = os.path.join(OUT, fname)
    out_lines = [
        f"# {fname} — ported reference scene config (hyperparameters are the\n",
        "# benchmark spec; see configs/README.md for the data layout).\n",
    ]
    dropped = 0
    with open(src) as f:
        for line in f:
            if DEAD_BINDINGS.match(line.strip()):
                dropped += 1
                out_lines.append(
                    f"# (dropped dead binding, param exists in no implementation: {line.strip()})\n"
                )
                continue
            out_lines.append(rewrite_data_dir(line, fname))
    if write:
        with open(dst, "w") as f:
            f.writelines(out_lines)
    return dropped


def main():
    write = "--write" in sys.argv
    ported = 0
    for fname in sorted(os.listdir(REF)):
        if fname in SKIP or not fname.endswith(".gin"):
            continue
        dropped = port_file(fname, write)
        ported += 1
        note = f" (-{dropped} dead)" if dropped else ""
        print(f"{'wrote' if write else 'would write'} configs/{fname}{note}")
    print(f"{ported} files")


if __name__ == "__main__":
    main()
