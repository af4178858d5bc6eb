"""Distributed-info shims (↔ openpoints/utils/dist_utils.py:14-54).

The torch stack derives (rank, world_size) from visible GPUs and spawns
processes; JAX is single-process SPMD, so "world size" is the local device
count and rank is always 0 on a single host.  ``reduce_tensor`` /
``gather_tensor`` become jnp psum/all_gather when called inside a mapped
context, or identity on the host.
"""
from __future__ import annotations

import socket
from typing import Tuple

import jax
import jax.numpy as jnp


def get_dist_info(cfg=None) -> Tuple[int, int, bool]:
    """Returns (rank, world_size, distributed)."""
    world_size = jax.device_count()
    rank = jax.process_index()
    distributed = world_size > 1
    if cfg is not None:
        cfg.rank = rank
        cfg.world_size = world_size
        cfg.distributed = distributed
        cfg.mp = False  # no process spawning in SPMD
    return rank, world_size, distributed


def reduce_tensor(tensor, axis_name: str = None):
    """Mean across the data-parallel axis (inside shard_map) or identity."""
    if axis_name is not None:
        return jax.lax.pmean(tensor, axis_name)
    return tensor


def gather_tensor(tensor, axis_name: str = None):
    if axis_name is not None:
        return jax.lax.all_gather(tensor, axis_name)
    return tensor


def find_free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port
