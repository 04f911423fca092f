"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's NCCL/torchrun distributed tier
(reference vit_utils/dist_util.py:47-212): instead of process groups and
hand-rolled coalesced allreduce, we lay out a ``jax.sharding.Mesh`` and
annotate arrays with ``NamedSharding``; XLA inserts the ICI collectives.

Axes:
* ``data``  — batch/data parallelism (training; the reference's DDP).
* ``batch`` — batch-of-crops parallelism for multi-stream serving
  (BASELINE config 5: batched ViT-H + YOLOv8x across 8 streams per chip).

Multi-host: call :func:`initialize_distributed` first (DCN rendezvous, the
analogue of the reference's SLURM/MPI env plumbing, dist_util.py:60-117).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (no-op on a single host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a host batch with the leading dim sharded over the mesh."""
    sh = batch_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def is_main_process() -> bool:
    """The reference's ``master_only`` guard (dist_util.py:130-138)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """Per-host slice of a globally sharded batch (the reference's
    DistributedSampler role, train_valid_fn.py:49-50)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
