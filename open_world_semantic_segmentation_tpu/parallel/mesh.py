"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data",
              devices=None) -> Mesh:
    """1-D data-parallel mesh over (the first n) available devices.

    The reference's only parallelism axis is data (SURVEY §2); a 1-D mesh
    over ICI is the TPU-native equivalent. Extend with more axes (e.g.
    ('data', 'model')) when spatial/model partitioning is introduced.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_for_batch(batch_size: int, axis_name: str = "data",
                        devices=None) -> Mesh:
    """Data mesh over the largest device count that divides ``batch_size``
    (a batch of 2 on an 8-device host uses 2 devices, not a crash)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.array(devices[:n]), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding: first array axis split across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x, sh: NamedSharding):
    """device_put onto a sharding; when the mesh spans multiple PROCESSES
    (DCN tier), the host value is this process's local shard and the global
    array is assembled with make_array_from_process_local_data (each leaf
    of a replicated tree must be identical on every process — true for
    seeded init and for per-host pipeline shards of the batch axis)."""
    if jax.process_count() > 1 and not sh.is_fully_addressable:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(x, sh)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """device_put a host batch with its leading axis split over the mesh.

    Multi-process: the per-host batch is this host's shard of the global
    batch (global batch = num_hosts x local batch)."""
    sh = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: _put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated over the mesh (params, state)."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: _put(x, sh), tree)


def shard_index_space(num_samples: int, num_hosts: int, host_id: int,
                      *, shuffle_seed: Optional[int] = None):
    """Per-host contiguous shard of the sample index space (replaces
    DistributedSampler). With a seed, a deterministic epoch permutation is
    applied before sharding so all hosts agree on the global order."""
    idx = np.arange(num_samples)
    if shuffle_seed is not None:
        idx = np.random.default_rng(shuffle_seed).permutation(idx)
    per_host = (num_samples + num_hosts - 1) // num_hosts
    pad = per_host * num_hosts - num_samples
    if pad:
        idx = np.concatenate([idx, idx[:pad]])
    return idx[host_id * per_host:(host_id + 1) * per_host]


def make_spatial_mesh(n_spatial: Optional[int] = None,
                      n_data: int = 1, devices=None) -> Mesh:
    """2-D ('data', 'spatial') mesh for partitioning the image plane.

    The reference's scaling axis beyond batch is spatial (full-res
    1024x2048 Cityscapes eval at batch 1, SURVEY §5): sharding W over the
    'spatial' axis under one jit program makes XLA insert the convolution
    halo exchanges automatically — numerics identical to single-device.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_spatial is None:
        n_spatial = len(devices) // n_data
    sel = np.array(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(sel, ("data", "spatial"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharded on batch AND width: P('data', None, 'spatial')."""
    return NamedSharding(mesh, P("data", None, "spatial"))
