"""Isolated hash-pyramid encoder fwd/bwd at train-step shapes on the TPU.

The round-3 instance digs attributed ~30% of the material/transient-material
steps to the encoder's per-tap hash gathers. The gather_microbench put the raw
take() ceiling at ~157M rows/s (f32) / 215M (bf16). This runs the REAL
encoder (ops/hashgrid.multires_grid_encode, flagship 8-level 16..2048 pyramid,
3 dense + 5 hash levels, T=524288, F=4, simplex) at material-stage point
counts, fwd and fwd+bwd, so per-step encoder cost is measured rather than
inferred from fusion names.

Usage: python benchmarks/encoder_microbench.py [points] [iters]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.ops import hashgrid


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = float(np.asarray(leaf.ravel()[0]))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 1572864
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    grid_sizes = tuple(
        int(s) for s in hashgrid.compute_grid_sizes(16, 2048, 1.0)
    )
    table_size = 524288
    dense_sizes = [s for s in grid_sizes if s**3 <= table_size]
    dense_offsets = tuple(
        int(o) for o in np.cumsum([0] + [s**3 for s in dense_sizes])[:-1]
    )
    num_hash = len(grid_sizes) - len(dense_sizes)
    f = 4

    key = jax.random.PRNGKey(0)
    tables = jax.random.normal(key, (num_hash, table_size, f), jnp.float32)
    pool = jax.random.normal(
        key, (sum(s**3 for s in dense_sizes), f), jnp.float32
    )
    x = jax.random.uniform(key, (p, 1, 3), jnp.float32)

    def enc(x, tables, pool):
        return hashgrid.multires_grid_encode(
            x, tables, pool,
            grid_sizes=grid_sizes, table_size=table_size,
            dense_offsets=dense_offsets, multisample_reduce="mean",
            interpolation="simplex",
        )

    fwd = jax.jit(enc)

    def loss(x, tables, pool):
        return jnp.sum(enc(x, tables, pool) ** 2)

    bwd = jax.jit(jax.grad(loss, argnums=(1, 2)))
    bwd_with_x = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    rows_per_call = 4 * len(grid_sizes) * p  # taps * levels * points
    for name, fn, args in [
        ("fwd", fwd, (x, tables, pool)),
        ("fwd+bwd(tables)", bwd, (x, tables, pool)),
        ("fwd+bwd(x,tables)", bwd_with_x, (x, tables, pool)),
    ]:
        dt = timeit(fn, *args, iters=iters)
        print(
            f"{name:18s} {dt*1e3:8.2f} ms  "
            f"{rows_per_call/dt/1e6:8.1f} M tap-rows/s  "
            f"({p/dt/1e6:6.2f} M points/s)"
        )


if __name__ == "__main__":
    main()
