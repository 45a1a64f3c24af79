"""On-chip layout A/B probe: OUR train step over the reference's own
grids-on-all-levels cache layout (every level carries a grid — the
architecture the reference binds in configs/ngp_yobo.gin's grid table),
timed at a given batch size on whatever device JAX defaults to.

This is the harness behind BASELINE.md's "layout A/B" rows (flagship
6.9-12.6x over grids-on-all-levels at identical step semantics) and the
round-2/3 Pallas-backward scale checks: the grids-on-all-levels layout
compiles one scatter instance per (encoder, kind) into a single backward,
which at batch >= 4096 crashed the remote TPU compile service before the
round-3 merged dense+hash kernel (ops/hashgrid.py encode_bwd) halved the
instance count.

Usage:  python benchmarks/layout_ab_probe.py [batch] [--flagship] [--xla-bwd]
"""

import sys

sys.path.insert(0, ".")

import dataclasses
import functools
import time

import jax

import bench
from neural_radiance_caching_tpu.data import datasets
from neural_radiance_caching_tpu.ops import hashgrid
from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
from neural_radiance_caching_tpu.parallel import train as train_lib
from neural_radiance_caching_tpu.utils import pytrees


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 2048
    layout = "flagship" if "--flagship" in sys.argv else "reference"
    if "--xla-bwd" in sys.argv:
        # A/B the backward itself: XLA scatter-adds vs the Pallas kernels.
        hashgrid.set_pallas_backward(False)

    config = dataclasses.replace(bench._cache_config(), batch_size=batch)
    dataset = datasets.SyntheticSpheres(
        "train", None, config, num_images=4, resolution=128
    )
    model = (
        bench.build_flagship_cache_model(config)
        if layout == "flagship"
        else bench.build_reference_layout_cache_model(config)
    )
    mesh = mesh_lib.create_mesh()
    variables = jax.jit(
        functools.partial(model.init, train_frac=1.0, train=False)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(16))
    state, _ = train_lib.create_optimizer(config, variables)
    state = mesh_lib.replicate(state, mesh)
    step = train_lib.create_train_step(model, config, mesh=mesh)
    batch_data = mesh_lib.shard_batch(dataset.next_train(), mesh)
    rng = jax.random.PRNGKey(0)

    state, stats = step(rng, state, batch_data, 0.5)
    print(f"[{layout}] B={batch} first step ok, "
          f"loss={float(stats['loss']):.5f}", flush=True)
    for _ in range(5):
        state, stats = step(rng, state, batch_data, 0.5)
    _ = float(stats["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, stats = step(rng, state, batch_data, 0.5)
    _ = float(stats["loss"])
    dt = (time.perf_counter() - t0) / 10
    print(f"[{layout}] B={batch} step_ms={dt * 1e3:.1f} "
          f"rays/s={batch / dt:.0f}", flush=True)


if __name__ == "__main__":
    main()
