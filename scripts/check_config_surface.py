"""Gap analysis: which reference gin bindings does this framework accept?

Scans a set of reference-style gin files for `Name.param = ...` bindings and
reports, per configurable, params that do not exist on the registered class
(dataclass field / flax attribute / function kwarg). Used while porting the
reference's 90 scene configs to keep the gin API surface complete.

Usage: python scripts/check_config_surface.py <dir-with-gin-files> [...]
"""

import dataclasses
import inspect
import re
import sys
from collections import defaultdict

sys.path.insert(0, ".")

import train_with_trainer  # noqa: F401  (registers Config/Trainer)
from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.engine import trainer as _trainer  # noqa: F401
from neural_radiance_caching_tpu.models import construct as _c  # noqa: F401
from neural_radiance_caching_tpu.models import (  # noqa: F401
    geometry, grids, integrator, light_sampler, material_model,
    material_shader, nerf_model, nerf_shader, sample_net, sampler, shading,
    surface_light_field,
)
from neural_radiance_caching_tpu.ops import render_utils as _ru  # noqa: F401

BINDING_RE = re.compile(r"^([A-Za-z_][\w]*)\.([\w]+)\s*=")


def class_params(target):
    if dataclasses.is_dataclass(target):
        return {f.name for f in dataclasses.fields(target)}
    if isinstance(target, type):
        # flax modules are dataclasses too; fall back to annotations.
        names = set()
        for k in getattr(target, "__annotations__", {}):
            names.add(k)
        for klass in target.__mro__:
            names.update(getattr(klass, "__annotations__", {}).keys())
        return names
    try:
        fn = getattr(target, "__wrapped__", target)
        return set(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        return None


def main(paths):
    import glob
    import os

    files = []
    for p in paths:
        if os.path.isdir(p):
            files += sorted(glob.glob(os.path.join(p, "*.gin")))
        else:
            files.append(p)

    missing = defaultdict(set)
    unknown_configurables = defaultdict(set)
    total = 0
    for path in files:
        for line in open(path):
            m = BINDING_RE.match(line.strip())
            if not m:
                continue
            total += 1
            cname, param = m.groups()
            target = gin._REGISTRY.get(cname)
            if target is None:
                unknown_configurables[cname].add(os.path.basename(path))
                continue
            params = class_params(target)
            if params is not None and param not in params:
                missing[cname].add(param)

    print(f"scanned {len(files)} files, {total} bindings")
    if unknown_configurables:
        print("\n== unregistered configurables ==")
        for c, fs in sorted(unknown_configurables.items()):
            print(f"  {c}  (in {len(fs)} files, e.g. {sorted(fs)[0]})")
    if missing:
        print("\n== registered configurables with missing params ==")
        for c, ps in sorted(missing.items()):
            print(f"  {c}: {', '.join(sorted(ps))}")
    if not unknown_configurables and not missing:
        print("all bindings resolve")


if __name__ == "__main__":
    main(sys.argv[1:] or ["configs"])
