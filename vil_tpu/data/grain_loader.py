"""Grain-backed data loader (alternative to the thread-pool DataLoader).

Drop-in interface match for :class:`vil_tpu.data.loader.DataLoader`
(dataset + sampler + batch_size → iterator of (images f32 NHWC, targets
i32) numpy batches), selected with ``DATALOADER.BACKEND 'grain'``.

Why: the default loader decodes in THREADS (fine for PIL, which releases
the GIL), but CPU-heavy augmentation pipelines (RandAugment + RandomErasing
at 384²) can saturate the GIL; Grain runs the decode in WORKER PROCESSES
with shared-memory handoff — the TPU-ecosystem equivalent of the
reference's torch DataLoader worker processes (dat/loader.py:141-168).

Design: vil_tpu's own samplers (per-host shards, RASampler repeated
augmentation — reference ra_sampler.py) drive the ORDER; each epoch their
index permutation is materialized and wrapped in a trivial
RandomAccessDataSource, so Grain sees a sequential read of a pre-permuted
view and only supplies process-parallel decode + batching.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np


class _PermutedSource:
    """grain RandomAccessDataSource view: position → dataset[order[pos]]."""

    def __init__(self, dataset, order):
        self._dataset = dataset
        self._order = order

    def __len__(self) -> int:
        return len(self._order)

    def __getitem__(self, i):
        img, target = self._dataset[int(self._order[i])]
        img = np.asarray(img, dtype=np.float32)
        if img.ndim == 2:  # grayscale H,W → H,W,1
            img = img[..., None]
        return img, np.int32(target)


class GrainDataLoader:
    """Same constructor/iteration contract as loader.DataLoader."""

    def __init__(self, dataset, sampler, batch_size: int,
                 drop_last: bool = True, num_workers: int = 4,
                 prefetch: int = 4):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_workers = max(0, num_workers)
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        import grain.python as gp

        order = np.fromiter(iter(self.sampler), dtype=np.int64)
        n = len(order)
        if self.drop_last:
            n = (n // self.batch_size) * self.batch_size
            order = order[:n]
        source = _PermutedSource(self.dataset, order)
        index_sampler = gp.IndexSampler(
            num_records=len(source),
            shard_options=gp.NoSharding(),  # host sharding handled upstream
            shuffle=False,  # order comes pre-permuted from vil_tpu samplers
            num_epochs=1,
        )
        loader = gp.DataLoader(
            data_source=source,
            sampler=index_sampler,
            operations=[gp.Batch(self.batch_size,
                                 drop_remainder=self.drop_last)],
            worker_count=self.num_workers,
            worker_buffer_size=max(1, self.prefetch),
        )
        for images, targets in loader:
            yield np.asarray(images), np.asarray(targets, dtype=np.int32)
