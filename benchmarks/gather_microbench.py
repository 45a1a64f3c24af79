"""Microbenchmark of hash-table gather strategies on the TPU.

The encoder's per-tap hash gathers run at ~27M rows/s in the traced train
steps (f32[2621440,4] out of a [4,2621440] table in 96 ms — the round-3
transient-material instance dig). This isolates the gather to find the
actual ceiling and which knobs move it:

  * operand orientation: rows [N, F] vs features [F, N] (cf.
    ops/hashgrid.set_gather_layout, measured neutral end-to-end)
  * table dtype: f32 vs bf16 (bytes vs latency bound)
  * index locality: uniform-random vs sorted vs tiled-local
  * fused weighting (gather + multiply, the encoder's real consumer)

Usage: python benchmarks/gather_microbench.py [rows] [queries]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    # axon gotcha: block_until_ready does not fence; fetch a scalar.
    _ = float(np.asarray(out.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.jit(fn)(*args)
    _ = float(np.asarray(out.ravel()[0]))
    return (time.perf_counter() - t0) / iters


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    queries = int(sys.argv[2]) if len(sys.argv) > 2 else 2621440
    f = 4
    key = jax.random.PRNGKey(0)
    table_rows = jax.random.normal(key, (rows, f), jnp.float32)
    table_feat = table_rows.T
    idx_rand = jax.random.randint(key, (queries,), 0, rows, jnp.int32)
    idx_sorted = jnp.sort(idx_rand)
    # Tiled-local: random within 8k-row windows that advance with position
    # (the locality a spatially-ordered query stream would give).
    win = 8192
    base = (jnp.arange(queries, dtype=jnp.int32) * ((rows - win) // queries))
    idx_local = base + jax.random.randint(key, (queries,), 0, win, jnp.int32)

    results = {}
    for name, fn, args in [
        ("rows_f32_random", lambda t, i: jnp.take(t, i, axis=0),
         (table_rows, idx_rand)),
        ("feat_f32_random", lambda t, i: jnp.take(t, i, axis=1),
         (table_feat, idx_rand)),
        ("rows_f32_sorted", lambda t, i: jnp.take(t, i, axis=0),
         (table_rows, idx_sorted)),
        ("rows_f32_local", lambda t, i: jnp.take(t, i, axis=0),
         (table_rows, idx_local)),
        ("rows_bf16_random", lambda t, i: jnp.take(t, i, axis=0),
         (table_rows.astype(jnp.bfloat16), idx_rand)),
        ("rows_f32_weighted",
         lambda t, i: jnp.take(t, i, axis=0)
         * (i % 7).astype(jnp.float32)[:, None],
         (table_rows, idx_rand)),
        # The traced train-step instance shape: [Q, F] output gathered from a
        # feature-major [F, N] table (gather + implicit transpose in one HLO).
        ("feat_T_f32_random",
         lambda t, i: jnp.take(t, i, axis=1).T,
         (table_feat, idx_rand)),
        # Realistic encoder tap: hash the index in the fusion (mul-xor-mod),
        # gather, weight — the producer/consumer work a real instance carries.
        ("rows_f32_hashed",
         lambda t, i: jnp.take(
             t, (i.astype(jnp.uint32) * jnp.uint32(2654435761) ^ jnp.uint32(805459861))
             .astype(jnp.uint32) % jnp.uint32(t.shape[0]),
             axis=0) * (i % 7).astype(jnp.float32)[:, None],
         (table_rows, idx_rand)),
        # 4-tap interpolation from one table (amortized per-tap rate): the
        # encoder's actual consumer pattern, sum of weighted tap gathers.
        ("rows_f32_interp4",
         lambda t, i: sum(
             jnp.take(t, (i + k) % t.shape[0], axis=0)
             * ((i % (7 + k)).astype(jnp.float32))[:, None]
             for k in range(4)),
         (table_rows, idx_rand)),
        ("bf16_interp4",
         lambda t, i: sum(
             jnp.take(t, (i + k) % t.shape[0], axis=0)
             * ((i % (7 + k)).astype(jnp.bfloat16))[:, None]
             for k in range(4)),
         (table_rows.astype(jnp.bfloat16), idx_rand)),
    ]:
        dt = timeit(fn, *args)
        rows_per_s = queries / dt
        results[name] = rows_per_s
        print(f"{name:20s} {dt*1e3:8.2f} ms  {rows_per_s/1e6:8.1f} M rows/s")
    return results


if __name__ == "__main__":
    main()
