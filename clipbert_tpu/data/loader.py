"""Batch loaders: sharded sampling, threaded prefetch, device overlap,
multi-task meta loading.

Reference equivalents:
 - torch DataLoader + DistributedSampler per rank
   (`/root/reference/src/tasks/run_video_retrieval.py:109-121`)
 - `MetaLoader` ratio-weighted multi-task iterator with the task choice
   broadcast to all ranks each accumulation window
   (`src/datasets/dataloader.py:14-83`)
 - `PrefetchLoader` H2D copy on a side CUDA stream + on-GPU ImageNorm
   (`src/datasets/dataloader.py:86-152`)
 - `InfiniteIterator` (`src/datasets/dataloader.py:155-162`)

TPU-first design:
 - Per-host data sharding by `(process_index, process_count)` slice of the
   shuffled epoch order (replacing DistributedSampler); batches are
   `jax.device_put` with the mesh data-sharding so each chip gets its slice.
 - Prefetch is a worker thread pool building the *next* batches while the
   device runs the current step (PIL/numpy release the GIL for the heavy
   parts; the C++ decoder drops it entirely).
 - MetaLoader task choice is derived from a seeded RNG on the step index —
   every host computes the same sequence, so no collective is needed where
   the reference had to broadcast (`dataloader.py:44-46`).
 - Normalization runs on device inside the jitted step (transforms.
   normalize_pixels), so loaders move uint8.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class ShardedBatchSampler:
    """Shuffled epoch order, sharded across hosts, fixed batch size.

    drop_last=True for training (static shapes); eval tail batches are
    replicated (not sharded) by `tasks.common.device_batch`.
    """

    def __init__(self, dataset_len: int, batch_size: int, shuffle: bool = True,
                 seed: int = 42, process_index: int = 0,
                 process_count: int = 1, drop_last: bool = True):
        self.dataset_len = dataset_len
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[List[int]]:
        order = np.arange(self.dataset_len)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        shard = order[self.process_index::self.process_count]
        n = len(shard)
        if self.drop_last:
            n = (n // self.batch_size) * self.batch_size
        for i in range(0, n, self.batch_size):
            yield shard[i:i + self.batch_size].tolist()

    def __len__(self) -> int:
        per_host = (self.dataset_len + self.process_count - 1
                    ) // self.process_count
        if self.drop_last:
            return per_host // self.batch_size
        return (per_host + self.batch_size - 1) // self.batch_size


class DataLoader:
    """dataset + sampler + collate with threaded prefetch.

    Threads (not processes): the hot work — JPEG/video decode, resize — is
    in C (PIL/torch/native decoder) and releases the GIL.
    """

    def __init__(self, dataset, sampler: ShardedBatchSampler,
                 collate_fn: Callable, num_workers: int = 4,
                 prefetch: int = 2):
        self.dataset = dataset
        self.sampler = sampler
        self.collate_fn = collate_fn
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)

    def __len__(self) -> int:
        return len(self.sampler)

    def _load_batch(self, indices: List[int]):
        return self.collate_fn([self.dataset[i] for i in indices])

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor
        batches = list(self.sampler)
        if not batches:
            return
        with ThreadPoolExecutor(self.num_workers) as pool:
            window = self.num_workers * self.prefetch
            futures = [pool.submit(self._load_batch, b)
                       for b in batches[:window]]
            nxt = window
            for i in range(len(batches)):
                out = futures[i].result()
                if nxt < len(batches):
                    futures.append(pool.submit(self._load_batch, batches[nxt]))
                    nxt += 1
                yield out


class PrefetchLoader:
    """Wraps a loader: moves batches to device (sharded) one step ahead so
    host->device transfer overlaps compute (the reference's side-stream
    prefetch, dataloader.py:86-152). Yields dicts whose array values are
    device arrays (non-array metadata passes through untouched).

    ``preprocess_fn`` (optional) maps the device batch right after the
    transfer is issued — used to DISPATCH the jitted resize/normalize for
    batch N+1 while step N is still executing on device (jax dispatch is
    async), so preprocess never sits on the critical path."""

    def __init__(self, loader, mesh=None, preprocess_fn=None):
        self.loader = loader
        self.mesh = mesh
        self.preprocess_fn = preprocess_fn

    @property
    def sampler(self):
        return getattr(self.loader, "sampler", None)

    def _put(self, batch: Dict) -> Dict:
        import jax
        from clipbert_tpu.core.mesh import put_batch_sharded
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object:
                if self.mesh is not None:
                    # single-host: shard over the mesh data axis (replicate
                    # non-divisible tails); multi-host: this host's rows
                    # become its slice of the global batch
                    out[k] = put_batch_sharded(self.mesh, v)
                else:
                    out[k] = jax.device_put(v)
            else:
                out[k] = v
        if self.preprocess_fn is not None:
            out = self.preprocess_fn(out)
        return out

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        it = iter(self.loader)
        try:
            pending = self._put(next(it))
        except StopIteration:
            return
        for batch in it:
            nxt = self._put(batch)   # enqueue next transfer
            yield pending
            pending = nxt
        yield pending


class MetaLoader:
    """Ratio-weighted multi-task sampling (dataloader.py:14-83).

    names2loader: {task_name: loader}; a task appearing with ratio r is
    sampled with probability r / sum(ratios). The per-step choice comes from
    a seeded RNG over the step counter, so all hosts agree for each
    `accum_steps` window without communication.
    """

    def __init__(self, names2loader: Dict[str, object],
                 ratios: Optional[Dict[str, float]] = None,
                 accum_steps: int = 1, seed: int = 42):
        self.names = list(names2loader)
        self.loaders = names2loader
        r = np.array([float((ratios or {}).get(n, 1.0)) for n in self.names])
        self.probs = r / r.sum()
        self.accum_steps = accum_steps
        self.seed = seed
        self._iters = {n: iter(InfiniteIterator(l))
                       for n, l in names2loader.items()}

    def __iter__(self):
        step = 0
        rng = np.random.default_rng(self.seed)
        while True:
            task = self.names[int(rng.choice(len(self.names), p=self.probs))]
            for _ in range(self.accum_steps):
                yield task, next(self._iters[task])
                step += 1


class InfiniteIterator:
    """Restart the underlying loader each epoch (dataloader.py:155-162),
    advancing the sampler epoch for fresh shuffles."""

    def __init__(self, loader):
        self.loader = loader

    def __iter__(self):
        epoch = 0
        while True:
            sampler = getattr(self.loader, "sampler", None)
            if sampler is not None and hasattr(sampler, "set_epoch"):
                sampler.set_epoch(epoch)
            yielded = False
            for batch in self.loader:
                yielded = True
                yield batch
            if not yielded:
                raise RuntimeError("empty loader in InfiniteIterator")
            epoch += 1
