"""Download one OpenIllumination object from the HuggingFace dataset hub.

Behavioral parity target: reference download_open_illum.py — resolves the
object list from the OpenIllumination index JSONs, then snapshot-downloads
the `lighting_patterns` or `OLAT` capture for one object (raw_undistorted
images + output poses, optionally the OLAT RAW files) into --local_dir, the
layout the `open_illumination` loader (data/datasets.py) consumes.

Requires network egress and `huggingface_hub`; both are unavailable in
sandboxed environments — the script degrades with a clear error instead of
an ImportError traceback.
"""

from __future__ import annotations

import argparse
import json
import sys

INDEX_URL = "https://oppo-us-research.github.io/OpenIllumination/data.json"
INDEX_OLAT_URL = "https://oppo-us-research.github.io/OpenIllumination/data_olat.json"
REPO_ID = "OpenIllumination/OpenIllumination"


def build_allow_patterns(light, data_name, with_raw=False):
    """The per-object HF snapshot filters (reference download_open_illum.py:24-28)."""
    patterns = [
        f"*{light}/{data_name}/Lights/*/raw_undistorted/*",
        f"*{light}/{data_name}/output/*",
    ]
    if light != "lighting_patterns" and with_raw:
        patterns.append(f"OLAT/{data_name}/RAW/*")
    return patterns


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--local_dir", default=".")
    parser.add_argument("--light", required=True,
                        choices=["lighting_patterns", "OLAT"])
    parser.add_argument("--obj_id", default=1, type=int)
    parser.add_argument("--with_raw", default=False, action="store_true")
    args = parser.parse_args(argv)

    try:
        from urllib.request import urlopen

        import huggingface_hub
    except ImportError as e:
        sys.exit(f"download_open_illum needs network egress and "
                 f"huggingface_hub ({e}); run it on a machine with both.")

    index_url = INDEX_URL if args.light == "lighting_patterns" else INDEX_OLAT_URL
    data = json.loads(urlopen(index_url).read())
    obj = data["obj_list"][args.obj_id - 1]
    huggingface_hub.snapshot_download(
        REPO_ID,
        repo_type="dataset",
        allow_patterns=build_allow_patterns(
            args.light, obj["data_name"], args.with_raw),
        local_dir=args.local_dir,
    )


if __name__ == "__main__":
    main()
