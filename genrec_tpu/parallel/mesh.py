"""Device-mesh construction and sharding helpers.

The reference's only parallelism is HF-Accelerate DDP over NCCL
(SURVEY.md §2.5; ``/root/reference/genrec/trainers/rqvae_trainer.py:102-106``).
The TPU-native replacement: one ``jax.sharding.Mesh`` with a ``data`` axis
(batch sharding; gradient psum fused by XLA through sharded autodiff) and a
``model`` axis (embedding-table / output-head sharding for large catalogs).
Collectives ride ICI within a slice and DCN across slices — XLA inserts them
from the shardings; there are no user-visible process groups.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With ``data=None`` the data axis absorbs all devices not used by
    ``model``. A single-device mesh is valid and makes every sharding
    annotation a no-op, so one code path serves 1 chip → full pod.

    On a multi-slice topology (devices spanning several ICI domains,
    e.g. v5e-256 × N connected over DCN) the layout is slice-aware: the
    data axis crosses slices — gradient psums are the only DCN traffic —
    while the model axis (table sharding / sequence rings, per-step
    collectives) stays inside a slice on ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")

    slice_ids = sorted({getattr(d, "slice_index", 0) or 0 for d in devices})
    if len(slice_ids) > 1:
        per_slice = n // len(slice_ids)
        if (per_slice * len(slice_ids) == n and per_slice % model == 0
                and data % len(slice_ids) == 0):
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_hybrid_device_mesh(
                (per_slice // model, model),
                (len(slice_ids), 1), devices=devices)
            return Mesh(arr.reshape(data, model), (DATA_AXIS, MODEL_AXIS))
        # uneven slice split: fall through to the flat layout

    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_stack_sharding(mesh: Mesh) -> NamedSharding:
    """For a (steps, batch, ...) stack fed to a scan-fused multi-step:
    the scan axis is replicated, the batch axis shards over data."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with batch-axis sharding.

    Under a multi-process runtime each process holds only ITS slice of the
    global batch (the Loader is process-sharded), so the global array is
    assembled with ``jax.make_array_from_process_local_data`` — the JAX
    analogue of the reference's ``Accelerator(split_batches=True)`` global
    batch semantics. Single-process keeps the plain ``device_put``.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        put = lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    else:
        put = lambda x: jax.device_put(np.asarray(x), sharding)
    return jax.tree_util.tree_map(
        lambda x: x if x is None else put(x),
        batch, is_leaf=lambda x: x is None)
