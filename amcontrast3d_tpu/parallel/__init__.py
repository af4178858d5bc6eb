"""Device-mesh data parallelism (↔ the reference's DDP/NCCL stack, §2.7).

The reference spawns one process per GPU with ``mp.spawn`` + NCCL
(``main_AA.py:857-865``); collectives are the DDP gradient allreduce, SyncBN,
and an ``all_reduce`` over eval confusion matrices.  TPU-native equivalent:

* one process, a ``jax.sharding.Mesh`` over all local chips, axis ``'dp'``;
* the train step runs under ``shard_map`` — batch sharded over ``'dp'``,
  params/optimizer state replicated, ``lax.pmean`` on gradients (the DDP
  allreduce), BatchNorm constructed with ``axis_name='dp'`` (SyncBN), and
  ``lax.psum`` on metric matrices (the eval all_reduce);
* gradients ride ICI via XLA collectives — no process groups, no NCCL.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "dp") -> dict:
    """Place a host batch dict with the leading axis split over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)
