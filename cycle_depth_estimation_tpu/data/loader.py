"""Threaded batch loader + device prefetch.

The host-side replacement for ``torch.utils.data.DataLoader(num_workers=N)``
(reference data/__init__.py:59-63): a thread pool decodes/transforms samples
(PIL/numpy release the GIL for the heavy parts), batches are stacked NHWC
numpy arrays, and `prefetch_to_device` keeps ``depth`` batches in flight to
HBM so TPU steps never wait on the host (SURVEY.md §2.3 async-data-loading
row).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


def _stack_batch(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals  # paths / metadata stay python lists
    return out


class DataLoader:
    """Iterable over batches; shuffling is seeded and epoch-dependent."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = True,
                 num_workers: int = 4, max_dataset_size: int = 2 ** 31,
                 seed: int = 0, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.max_dataset_size = max_dataset_size
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self._pool: Optional[cf.ThreadPoolExecutor] = None

    def __len__(self):
        n = min(len(self.dataset), self.max_dataset_size)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _indices(self) -> np.ndarray:
        n = min(len(self.dataset), self.max_dataset_size)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed * 7919 + self.epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self._pool is None:
            self._pool = cf.ThreadPoolExecutor(max_workers=self.num_workers)
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        # pipeline: keep up to 2 batches of samples in flight
        pending: List[List[cf.Future]] = []
        bi = 0

        def submit(b):
            return [self._pool.submit(self.dataset.__getitem__, int(i)) for i in b]

        while bi < len(batches) and len(pending) < 2:
            pending.append(submit(batches[bi]))
            bi += 1
        while pending:
            futs = pending.pop(0)
            if bi < len(batches):
                pending.append(submit(batches[bi]))
                bi += 1
            yield _stack_batch([f.result() for f in futs])


_WORKER_DATASET = None
_WORKER_EPOCH = None


def _proc_worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _proc_worker_get(i: int, epoch: int):
    global _WORKER_EPOCH
    if _WORKER_EPOCH != epoch and hasattr(_WORKER_DATASET, "set_epoch"):
        # epoch-dependent transforms (seeded crops/flips) were set on the
        # PARENT's dataset copy; forked workers must follow
        _WORKER_DATASET.set_epoch(epoch)
        _WORKER_EPOCH = epoch
    return _WORKER_DATASET[i]


class ProcessDataLoader(DataLoader):
    """Process-pool loader: the true ``num_workers=N`` analogue.

    The thread loader above relies on PIL/numpy releasing the GIL; the
    Python-level transform glue (remap LUTs, band splits, dict plumbing)
    still serializes. This one forks ``num_workers`` OS processes (the
    dataset is shipped once per worker at pool start, not per task) so the
    WHOLE per-sample path runs in parallel — matching the reference's
    multi-process torch DataLoader (reference new_multi/try_data.py:436,
    num_workers=8). Cost: one result pickle per sample (a few MB/s at these
    shapes — measured in tools/bench_loader.py).

    Per-host in a multi-host DP job: each process runs its own
    ProcessDataLoader; prefetch_to_device slices the per-process share.
    """

    def _make_pool(self):
        import concurrent.futures
        import multiprocessing as mp

        ctx = mp.get_context("fork")  # cheap dataset inheritance on linux
        return concurrent.futures.ProcessPoolExecutor(
            max_workers=self.num_workers, mp_context=ctx,
            initializer=_proc_worker_init, initargs=(self.dataset,))

    def __iter__(self):
        if self._pool is None:
            self._pool = self._make_pool()
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        pending = []
        bi = 0

        def submit(b):
            return [self._pool.submit(_proc_worker_get, int(i), self.epoch)
                    for i in b]

        while bi < len(batches) and len(pending) < 2:
            pending.append(submit(batches[bi]))
            bi += 1
        while pending:
            futs = pending.pop(0)
            if bi < len(batches):
                pending.append(submit(batches[bi]))
                bi += 1
            yield _stack_batch([f.result() for f in futs])

    def shutdown(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None


def prefetch_to_device(iterator, mesh=None, depth: int = 2,
                       spatial_axis=None):
    """Double-buffered host→HBM transfer.

    Wraps a batch iterator; array leaves are `jax.device_put` (sharded over
    the mesh's ``data`` axis when a mesh is given) ``depth`` batches ahead of
    consumption. Non-array leaves (paths) pass through untouched.
    ``spatial_axis`` additionally splits the H dim of rank-≥3 leaves over
    that mesh axis (``--parallel sp``; see parallel/mesh.host_shard_batch).
    """
    import collections

    import jax

    from ..parallel.mesh import host_shard_batch

    def put(batch):
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        others = {k: v for k, v in batch.items() if k not in arrays}
        if jax.process_count() > 1:
            # every process loads the same (seed-synchronized) global batch;
            # each contributes its process-local slice to the global array
            pc, pi = jax.process_count(), jax.process_index()
            n = len(next(iter(arrays.values()))) if arrays else 0
            if n % pc != 0:
                # a ragged split would silently drop samples (or produce
                # zero-length local shards) — fail with the config fix
                raise ValueError(
                    f"global batch {n} is not divisible by process_count "
                    f"{pc}; set --batch_size to a multiple of the process "
                    f"count (drop_last already removes partial batches)")
            arrays = {k: v[pi * (len(v) // pc):(pi + 1) * (len(v) // pc)]
                      for k, v in arrays.items()}
        if mesh is not None:
            arrays = host_shard_batch(mesh, arrays, spatial_axis=spatial_axis)
        else:
            arrays = {k: jax.device_put(v) for k, v in arrays.items()}
        return {**arrays, **others}

    queue = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield queue.popleft()
