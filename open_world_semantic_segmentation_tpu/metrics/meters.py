"""Running meters and timers.

``AverageMeter`` mirrors anomaly/utils.py:33-65 (scalar or vector sums with
optional weights). ``StepTimer`` replaces the reference's
``torch.cuda.synchronize(); time.perf_counter()`` pattern
(eval_ood_traditional.py:188-189, 574-575) with ``block_until_ready``.
"""

from __future__ import annotations

import time

import jax
import numpy as np


class AverageMeter:
    """Computes and stores the average and current value."""

    def __init__(self):
        self.initialized = False
        self.val = None
        self.avg = None
        self.sum = None
        self.count = None

    def initialize(self, val, weight):
        self.val = val
        self.avg = val
        self.sum = np.multiply(val, weight)
        self.count = weight
        self.initialized = True

    def update(self, val, weight=1):
        if not self.initialized:
            self.initialize(val, weight)
        else:
            self.add(val, weight)

    def add(self, val, weight):
        self.val = val
        self.sum = np.add(self.sum, np.multiply(val, weight))
        self.count = self.count + weight
        self.avg = self.sum / self.count

    def value(self):
        return self.val

    def average(self):
        return self.avg


class KeyedAverageMeter:
    """Dict-of-averages meter (DeepLab metrics/stream_metrics.py:86-111)."""

    def __init__(self):
        self.book = dict()

    def reset_all(self):
        self.book.clear()

    def reset(self, id):
        item = self.book.get(id, None)
        if item is not None:
            item[0] = 0
            item[1] = 0

    def update(self, id, val):
        record = self.book.get(id, None)
        if record is None:
            self.book[id] = [val, 1]
        else:
            record[0] += val
            record[1] += 1

    def get_results(self, id):
        record = self.book.get(id, None)
        assert record is not None
        return record[0] / record[1]


class StepTimer:
    """Wall-clock timer that synchronizes on device work before reading time."""

    def __init__(self):
        self.meter = AverageMeter()
        self._tic = None

    def start(self, *sync_on):
        for x in sync_on:
            jax.block_until_ready(x)
        self._tic = time.perf_counter()

    def stop(self, *sync_on):
        for x in sync_on:
            jax.block_until_ready(x)
        dt = time.perf_counter() - self._tic
        self.meter.update(dt)
        return dt

    def average(self):
        return self.meter.average()
