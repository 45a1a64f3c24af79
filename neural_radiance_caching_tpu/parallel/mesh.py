"""Device mesh and sharding utilities.

TPU-first replacement for the reference's pmap + host-side shard() pattern
(internal/utils.py:333-344, train_utils.py:3172-3177): a single 1D "data"
mesh over all devices (ICI within a slice, DCN across slices), batches
sharded along their leading axis with NamedSharding, parameters replicated.
The jitted step's gradient psum is inserted by XLA from the shardings — no
explicit collectives in user code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices=None) -> Mesh:
    """1D data-parallel mesh over all (or the given) devices.

    When the mesh lives on non-TPU devices (e.g. the forced-host CPU mesh
    used for multi-chip dry runs while a real TPU plugin is still
    registered), the Pallas encoder path cannot lower — switch the fused
    encoder to its pure-XLA fallback globally.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if devices and devices[0].platform != "tpu":
        from neural_radiance_caching_tpu.ops import hashgrid

        hashgrid.force_xla_encoder(True)
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def rays_shardings(mesh: Mesh):
    """Per-field in_shardings prefix for a Rays argument: batch-sharded
    per-ray leaves, replicated `impulse_response` (the 1-D sensor kernel
    shared by every ray — batch-sharding it would require the kernel length
    to divide the mesh size)."""
    import dataclasses

    from neural_radiance_caching_tpu.utils import pytrees

    bs = batch_sharding(mesh)
    vals = {f.name: bs for f in dataclasses.fields(pytrees.Rays)}
    vals["impulse_response"] = replicated_sharding(mesh)
    return pytrees.Rays(**vals)


def shard_batch(batch, mesh: Mesh):
    """Device-put every array field of a pytree with the batch sharding.

    The leading dimension must be divisible by the mesh size. Unlike the
    reference's shard(), no [D, B/D] reshape happens — the global shape is
    preserved and XLA sees a [B]-shaped array laid out across devices.

    `rays.impulse_response` (the 1-D sensor kernel, shared by every ray) is
    the one GLOBAL leaf in the batch pytree: it is replicated, not
    batch-sharded. The jitted train step inherits these committed shardings
    (its batch in_sharding is None), so every caller must go through this
    function (or DevicePrefetcher, which does).
    """
    sharding = batch_sharding(mesh)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, sharding)

    repl = replicated_sharding(mesh)
    rays = getattr(batch, "rays", None)  # Batch vs bare Rays
    ray_kernel = getattr(rays if rays is not None else batch,
                         "impulse_response", None)
    batch_kernel = (
        getattr(batch, "impulse_response", None) if rays is not None else None
    )
    strip = batch
    if ray_kernel is not None:
        strip = (
            strip.replace(rays=strip.rays.replace(impulse_response=None))
            if rays is not None
            else strip.replace(impulse_response=None)
        )
    if batch_kernel is not None:
        strip = strip.replace(impulse_response=None)
    out = jax.tree_util.tree_map(put, strip)
    if ray_kernel is not None:
        kernel = jax.device_put(ray_kernel, repl)
        out = (
            out.replace(rays=out.rays.replace(impulse_response=kernel))
            if rays is not None
            else out.replace(impulse_response=kernel)
        )
    if batch_kernel is not None:
        out = out.replace(impulse_response=jax.device_put(batch_kernel, repl))
    return out


class DevicePrefetcher:
    """Pipelines host→device transfer one step ahead of compute.

    Wraps a host-batch iterator (e.g. RayBatcher); a daemon thread calls
    `shard_batch` (async `jax.device_put`) so the transfer of batch N+1
    overlaps the train step on batch N. The jit-level equivalent of the
    reference's `flax.jax_utils.prefetch_to_device(..., 3)`
    (engine/trainer.py:2087) for NamedSharding arrays.
    """

    def __init__(self, it, mesh: Mesh, buffer_size: int = 2):
        import queue as _queue
        import threading

        self._it = it
        self._queue: "_queue.Queue" = _queue.Queue(buffer_size)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(mesh,), daemon=True
        )
        self._thread.start()

    def _run(self, mesh):
        while not self._stop.is_set():
            try:
                batch = shard_batch(next(self._it), mesh)
            except StopIteration:
                self._queue.put(None)
                return
            self._queue.put(batch)

    def __iter__(self):
        return self

    def __next__(self):
        batch = self._queue.get()
        if batch is None:
            raise StopIteration
        return batch

    def stop(self):
        self._stop.set()
        try:
            self._queue.get_nowait()
        except Exception:
            pass
        if hasattr(self._it, "stop"):
            self._it.stop()


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) onto every device in the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if x is not None else None, tree
    )


def pad_rays_to_devices(tree, num_devices):
    """Pad the leading axis to a multiple of num_devices; returns (tree, pad)."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "shape")]
    n = leaves[0].shape[0]
    pad = (-n) % num_devices
    if pad == 0:
        return tree, 0

    def pad_fn(x):
        if x is None or not hasattr(x, "shape"):
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        if isinstance(x, np.ndarray):
            return np.pad(x, widths, mode="edge")
        return jnp.pad(x, widths, mode="edge")

    return jax.tree_util.tree_map(pad_fn, tree), pad
