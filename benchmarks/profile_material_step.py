"""Capture a jax.profiler trace of the material-stage train step and print
the top self-time ops (gather/scatter vs MXU split).

Usage: python benchmarks/profile_material_step.py
    [--cache | --transient | --transient-material] [--trace-dir D]
"""

import glob
import gzip
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import bench
from neural_radiance_caching_tpu.data import datasets
from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
from neural_radiance_caching_tpu.parallel import train as train_lib
from neural_radiance_caching_tpu.utils import pytrees

TRACE_DIR = "/tmp/mat_trace"


def summarize_xplane(trace_dir):
    """Aggregate self-time by op category from the captured xplane proto."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        print("no xplane found under", trace_dir)
        return
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        # Build metadata map: id -> name.
        meta = {m.id: m.name for _, m in plane.event_metadata.items()}
        totals = {}
        per_line = {}  # line name -> {op name: ps}
        intervals = []  # (start_ps, end_ps) across all op lines
        # FULL line inventory: every track's busy union, so time living on
        # non-"XLA Ops" lines (DMA engines, SparseCore, infeed, step
        # markers) is visible instead of landing in "unattributed".
        line_events = {}  # line name -> [(start, end, op name)]
        for line in plane.lines:
            evs = [
                (ev.offset_ps, ev.offset_ps + ev.duration_ps,
                 meta.get(ev.metadata_id, "?"))
                for ev in line.events
            ]
            if evs:
                line_events.setdefault(line.name or "?", []).extend(evs)
        for lname, evs in line_events.items():
            # Only the op-level lines (XLA Ops) feed the category split.
            if "XLA Ops" not in lname and "xla" not in lname.lower():
                continue
            ltot = per_line.setdefault(lname, {})
            for s, e, name in evs:
                totals[name] = totals.get(name, 0) + (e - s)
                ltot[name] = ltot.get(name, 0) + (e - s)
                intervals.append((s, e))
        if not totals:
            continue
        total = sum(totals.values())
        # Honest time accounting: summed event durations double-count
        # whenever tracks overlap (async copy-start/done spans cover the
        # compute they hide under — the round-3 "copies 26%" artifact).
        # The interval UNION is the device's actual busy wall; categories
        # should be read against it, and a sum/union ratio >> 1 flags a
        # trace where per-category percentages overstate.
        intervals.sort()
        union = 0
        span = (intervals[-1][1] - intervals[0][0]) if intervals else 0
        cur_s, cur_e = None, None
        for s, e in intervals:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    union += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            union += cur_e - cur_s
        print(f"\nplane: {plane.name}  total op-time {total/1e12:.3f} s")
        print(
            f"  busy union {union/1e12:.3f} s over span {span/1e12:.3f} s"
            f"  (overlap factor {total/max(union,1):.2f}x — percentages"
            " below are of SUMMED op time, not wall)"
        )
        cats = {}
        for name, t in totals.items():
            base = name.split(".")[0].split("-")[0]
            cats[base] = cats.get(base, 0) + t
        for name, t in sorted(cats.items(), key=lambda kv: -kv[1])[:18]:
            print(f"  {100*t/total:5.1f}%  {t/1e9:9.2f} ms  {name}")
        for lname, ltot in sorted(per_line.items()):
            lsum = sum(ltot.values())
            print(f"  track '{lname}': {lsum/1e9:.2f} ms summed")
            if "Async" in lname or "Module" in lname or not ltot:
                continue
            # The synchronous op track is the actionable one: its events
            # don't overlap each other, so these fractions ARE wall
            # fractions of the step.
            lcats = {}
            for name, t in ltot.items():
                base = name.split(".")[0].split("-")[0]
                lcats[base] = lcats.get(base, 0) + t
            for name, t in sorted(lcats.items(), key=lambda kv: -kv[1])[:10]:
                print(f"    {100*t/lsum:5.1f}%  {t/1e9:9.2f} ms  {name}")
        # Individual hot instances: the category split says WHAT kind of
        # work dominates; the instance list says WHICH op (full HLO name,
        # so shapes/opcodes can be looked up in the dumped HLO) — this is
        # how the round-3 gather/IPE-buffer findings were localized.
        print("  top instances:")
        for name, t in sorted(totals.items(), key=lambda kv: -kv[1])[:14]:
            print(f"    {100*t/total:5.1f}%  {t/1e9:9.2f} ms  {name[:140]}")

        # --- unattributed-tail decomposition (VERDICT r4 item 7) ---------
        # (a) Every line's busy union: work on non-op tracks (DMA queues,
        # infeed, SparseCore, step markers) is real device time the op
        # categories above never see.
        print("  all-track busy unions:")
        for lname, evs in sorted(line_events.items()):
            ivs = sorted((s, e) for s, e, _ in evs)
            u, cs, ce = 0, None, None
            for s, e in ivs:
                if ce is None or s > ce:
                    if ce is not None:
                        u += ce - cs
                    cs, ce = s, e
                else:
                    ce = max(ce, e)
            if ce is not None:
                u += ce - cs
            print(f"    {u/1e9:9.2f} ms busy  [{len(evs):6d} events]  {lname}")
        # (b) Gap structure on the synchronous op track: time where NO op
        # runs is the true unattributed remainder; naming the ops that
        # bound each large gap says what the device was waiting on.
        sync = []
        for lname, evs in line_events.items():
            if "XLA Ops" in lname and "Async" not in lname:
                sync.extend(evs)
        if sync:
            sync.sort()
            merged = []  # (start, end, opening op, closing op)
            cs, ce, last_op = sync[0][0], sync[0][1], sync[0][2]
            gaps = []
            for s, e, name in sync[1:]:
                if s > ce:
                    gaps.append((s - ce, ce, last_op, name))
                    cs, ce, last_op = s, e, name
                else:
                    if e > ce:
                        ce, last_op = e, name
            gap_total = sum(g for g, *_ in gaps)
            span = sync[-1][1] - sync[0][0]
            print(
                f"  sync-track gaps: {gap_total/1e9:.2f} ms total over "
                f"{span/1e9:.2f} ms span ({100*gap_total/max(span,1):.1f}% idle)"
            )
            for g, at, before, after in sorted(gaps, reverse=True)[:12]:
                print(f"    {g/1e9:8.3f} ms gap  after {before[:60]!r}")
                print(f"                    before {after[:60]!r}")
        return


def main():
    import dataclasses

    cache_only = "--cache" in sys.argv
    transient = "--transient" in sys.argv
    transient_material = "--transient-material" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--trace-dir":
            globals()["TRACE_DIR"] = sys.argv[i + 1]

    config = bench._cache_config()
    resolution = 128
    if transient_material:
        # Mirror bench.py's transient_material_stage config exactly so the
        # trace explains the benched number.
        config = dataclasses.replace(
            config,
            batch_size=bench.TRANSIENT_MATERIAL_BATCH_SIZE,
            use_transient=True,
            n_bins=bench.TRANSIENT_N_BINS,
            exposure_time=0.02,
            learnable_light=True,
            light_source_position=[0.0, 0.0, 1.0],
            data_loss_type="rawnerf_transient_unbiased",
            linear_to_srgb=False,
            secondary_far=4.0,
            material_loss_radius=4.0,
            use_gradient_debias=True,
            gradient_checkpointing=True,
            cache_consistency_loss_weight=1.0,
            cache_consistency_loss_type="mse_unbiased",
            distortion_loss_mult=0.0,
            predicted_normal_loss_mult=0.0,
            predicted_normal_reverse_loss_mult=0.0,
        )
        model = bench.build_flagship_transient_material_model(config)
        batch_size = bench.TRANSIENT_MATERIAL_BATCH_SIZE
        resolution = 64
    elif transient:
        # Mirror bench.py's transient_stage config exactly so the trace
        # explains the benched number.
        config = dataclasses.replace(
            config,
            batch_size=bench.TRANSIENT_BATCH_SIZE,
            use_transient=True,
            n_bins=bench.TRANSIENT_N_BINS,
            exposure_time=0.02,
            learnable_light=True,
            light_source_position=[0.0, 0.0, 1.0],
            data_loss_type="rawnerf_transient_unbiased",
            linear_to_srgb=False,
        )
        model = bench.build_flagship_transient_cache_model(config)
        batch_size = bench.TRANSIENT_BATCH_SIZE
        resolution = 64
    elif not cache_only:
        config = dataclasses.replace(
            config, batch_size=bench.MATERIAL_BATCH_SIZE, secondary_far=4.0,
            material_loss_radius=4.0, data_loss_type="rawnerf_unbiased",
            use_gradient_debias=True, gradient_checkpointing=True,
            distortion_loss_mult=0.0, predicted_normal_loss_mult=0.0,
            predicted_normal_reverse_loss_mult=0.0,
        )
        model = bench.build_flagship_material_model(config)
        batch_size = bench.MATERIAL_BATCH_SIZE
    else:
        model = bench.build_flagship_cache_model(config)
        batch_size = bench.BATCH_SIZE

    dataset = datasets.SyntheticSpheres(
        "train", None, config, num_images=4, resolution=resolution
    )
    mesh = mesh_lib.create_mesh()
    import functools

    variables = jax.jit(functools.partial(model.init, train_frac=1.0, train=False))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(16)
    )
    state, _ = train_lib.create_optimizer(config, variables)
    state = mesh_lib.replicate(state, mesh)
    step = train_lib.create_train_step(model, config, mesh=mesh)
    batches = [mesh_lib.shard_batch(dataset.next_train(), mesh) for _ in range(4)]
    rng = jax.random.PRNGKey(0)
    print("compiling...", flush=True)
    for i in range(3):
        state, stats = step(rng, state, batches[i % 4], 0.5)
    print("warm, loss:", float(stats["loss"]), flush=True)

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for i in range(3):
        with jax.profiler.StepTraceAnnotation("train", step_num=i):
            state, stats = step(rng, state, batches[i % 4], 0.5)
    _ = float(stats["loss"])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)
    summarize_xplane(TRACE_DIR)


if __name__ == "__main__":
    main()
