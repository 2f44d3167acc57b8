"""Minimal map-style dataset batcher (host-side, thread-friendly).

Replaces the torch DataLoader for the DeepLab stack: fixed-size crops make
every batch one static shape, so a plain stacking collate suffices.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np


def default_collate(samples):
    """Stack tuples of (image, target, target_true) arrays into a batch."""
    first = samples[0]
    if isinstance(first, tuple):
        return tuple(np.stack([s[i] for s in samples])
                     for i in range(len(first)))
    if isinstance(first, dict):
        return {k: np.stack([s[k] for s in samples]) for k in first}
    return np.stack(samples)


def batch_iterator(dataset, batch_size: int, *, shuffle: bool = True,
                   seed: int = 1, drop_last: bool = True,
                   collate: Callable = default_collate,
                   num_workers: int = 8,
                   epochs: Optional[int] = None,
                   num_hosts: int = 1, host_id: int = 0) -> Iterator:
    """Yield collated batches; loops over epochs (None = forever).

    With ``num_hosts > 1`` each host draws a disjoint covering shard of a
    permutation every host agrees on (seeded by ``seed + epoch``) — the
    SPMD replacement for torch's DistributedSampler
    (anomaly/lib/utils/data/distributed.py:7).
    """
    n = len(dataset)
    epoch = 0
    pool = ThreadPoolExecutor(max_workers=num_workers) if num_workers else None
    try:
        while epochs is None or epoch < epochs:
            if num_hosts > 1:
                from ..parallel.mesh import shard_index_space

                order = shard_index_space(
                    n, num_hosts, host_id,
                    shuffle_seed=(seed + epoch) if shuffle else None)
            else:
                order = (np.random.default_rng(seed + epoch).permutation(n)
                         if shuffle else np.arange(n))
            for start in range(0, len(order), batch_size):
                idx = order[start:start + batch_size]
                if len(idx) < batch_size and drop_last:
                    continue
                if pool is not None:
                    samples = list(pool.map(dataset.__getitem__, idx))
                else:
                    samples = [dataset[i] for i in idx]
                yield collate(samples)
            epoch += 1
    finally:
        if pool is not None:
            pool.shutdown(wait=False)
