"""SPMD parallelism over the TPU mesh.

This package replaces the reference's entire parallel runtime:

- ``UserScatteredDataParallel`` + async copy streams
  (anomaly/lib/nn/parallel/data_parallel.py) -> one pjit-compiled SPMD
  program over a 1-D ``data`` mesh axis; inputs are laid out with
  ``NamedSharding(P("data"))`` by the prefetcher.
- Thread-based SyncBN (anomaly/lib/nn/modules/batchnorm.py, comm.py,
  replicate.py) -> nothing at all: under a single jit/pjit program the
  batch axis is a *logical* global axis, so BatchNorm's batch statistics are
  global-batch statistics and XLA inserts the ICI all-reduces. Under
  shard_map/pmap, set ``BNConfig.axis_name`` and Flax performs the
  ``lax.pmean`` explicitly. Either way: exact SyncBN semantics, no
  master/slave futures, no replication callbacks.
- ``DistributedSampler`` (anomaly/lib/utils/data/distributed.py) ->
  ``shard_index_space`` (per-host contiguous shard of the sample index
  space; DCN is only used implicitly by the runtime).
"""

from .mesh import (
    make_mesh_for_batch,
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    shard_index_space,
    make_spatial_mesh,
    spatial_sharding,
)
