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


class _BatchSource:
    """grain RandomAccessDataSource where each RECORD is a whole collated
    batch (position j → stacked batch j of the pre-permuted order).

    Batching inside the source — rather than a gp.Batch operation — is
    load-bearing: grain splits records round-robin across worker processes
    and applies operations PER WORKER, so record-level batching with
    worker_count > 1 would compose batches from every worker-th sample
    (seen: [0,2,4] / [1,3,5] instead of [0,1,2] / [3,4,5]). With
    batch-as-record each worker assembles exact batches and grain's
    deterministic output order preserves the sampler's batch order. It also
    amortizes the worker→main IPC to one handoff per batch."""

    def __init__(self, dataset, order, batch_size: int):
        self._dataset = dataset
        self._order = order
        self._bs = batch_size

    def __len__(self) -> int:
        return len(self._order) // self._bs

    def __getitem__(self, j):
        idxs = self._order[j * self._bs : (j + 1) * self._bs]
        imgs, targets = [], []
        for i in idxs:
            img, target = self._dataset[int(i)]
            img = np.asarray(img, dtype=np.float32)
            if img.ndim == 2:  # grayscale H,W → H,W,1
                img = img[..., None]
            imgs.append(img)
            targets.append(np.int32(target))
        return np.stack(imgs), np.asarray(targets, dtype=np.int32)


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
        n_full = (len(order) // self.batch_size) * self.batch_size
        source = _BatchSource(self.dataset, order[:n_full], self.batch_size)
        index_sampler = gp.IndexSampler(
            num_records=len(source),
            shard_options=gp.NoSharding(),  # host sharding handled upstream
            shuffle=False,  # order comes pre-permuted from vil_tpu samplers
            num_epochs=1,
        )
        loader = gp.DataLoader(
            data_source=source,
            sampler=index_sampler,
            operations=[],  # batches assembled in the source (see above)
            worker_count=self.num_workers,
            worker_buffer_size=max(1, self.prefetch),
        )
        for images, targets in loader:
            yield np.asarray(images), np.asarray(targets, dtype=np.int32)
        if not self.drop_last and n_full < len(order):
            # ragged tail batch, assembled in-process
            tail = _BatchSource(
                self.dataset, order[n_full:], len(order) - n_full
            )
            yield tail[0]
