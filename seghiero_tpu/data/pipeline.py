"""Host→device input pipeline.

The reference uses torch DataLoader worker processes doing PIL decode +
transform + normalize, then a blocking H2D copy per batch
(train.py:121-134, 261-262). TPU-native replacement:

  * samples stay uint8 on the host (4× smaller transfer); normalization
    runs on-device (``normalize_images``) where XLA fuses it into the
    first conv;
  * a background thread decodes/collates the *next* batch while the
    device computes the current one (double buffering) and
    ``jax.device_put`` lands each batch directly with the mesh sharding
    (batch sharded over the 'data' axis), so per-replica slices go to
    their own chips without a gather;
  * static shapes: fixed batch size, short batches dropped (train) or
    padded with repeats + a mask-by-255 (eval) so jit never recompiles.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


def normalize_images(
    images_u8: jax.Array,
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
) -> jax.Array:
    """uint8 NHWC → normalized f32, matching torchvision
    ToTensor+Normalize (dataloader.py:60-62)."""
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0
    return (images_u8.astype(jnp.float32) - mean) / std


def _collate(samples) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class BatchLoader:
    """Iterable over collated, optionally device-put batches.

    Args:
      dataset: map-style dataset yielding dicts of numpy arrays.
      batch_size: global batch size (must divide by mesh data axis when
        sharding is provided).
      shuffle: reshuffle indices each epoch with a per-epoch seed.
      drop_last: drop the short final batch (True for train — static
        shapes); when False, the final batch is padded by repeating
        sample 0 with labels forced to 255 so metrics ignore the padding.
      sharding: optional ``jax.sharding.Sharding`` for device_put.
      prefetch: number of batches prepared ahead on a worker thread.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        sharding=None,
        prefetch: int = 2,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.sharding = sharding
        self.prefetch = max(0, prefetch)
        self.epoch = 0
        # decode-parallelism (the reference's DataLoader num_workers,
        # train.py:125); threads not processes — PIL decode releases the GIL
        self._pool = None
        if num_workers and num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=num_workers)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch])
            ).shuffle(idx)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            yield idx[i : i + self.batch_size]

    def _make_batch(self, indices) -> Dict[str, np.ndarray]:
        if hasattr(self.dataset, "get_batch") and self._pool is None:
            # batched fast path (RawCacheDataset): one gather collates
            # the whole batch — no per-sample dict + np.stack round trip
            batch = self.dataset.get_batch(indices)
            pad = self.batch_size - len(indices)
        else:
            if self._pool is not None:
                samples = list(
                    self._pool.map(self.dataset.__getitem__, map(int, indices))
                )
            else:
                samples = [self.dataset[int(i)] for i in indices]
            pad = self.batch_size - len(samples)
            batch = _collate(samples)
        if pad > 0:
            for k, v in batch.items():
                filler = np.repeat(v[:1], pad, axis=0)
                if k != "image":
                    filler = np.full_like(filler, 255)  # ignored by losses/metrics
                batch[k] = np.concatenate([v, filler], axis=0)
        return batch

    def _host_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        for indices in self._batch_indices():
            yield self._make_batch(indices)

    def __iter__(self):
        host_iter = self._host_batches()
        if self.prefetch == 0:
            for b in host_iter:
                yield self._put(b)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def worker():
            try:
                for b in host_iter:
                    q.put(b)
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is sentinel:
                if err:
                    raise err[0]
                return
            yield self._put(b)

    def _put(self, batch: Dict[str, np.ndarray]):
        if self.sharding is None:
            return batch
        return jax.device_put(batch, self.sharding)


class GrainBatchLoader:
    """Grain-backed loader (``training.loader: "grain"``).

    Same interface and batch contract as ``BatchLoader``, but the index
    sampling, record sharding and worker parallelism are delegated to
    `grain` for *deterministic multi-process / multi-host* input:

      * records are sharded across JAX processes with
        ``grain.ShardOptions(process_index, process_count)`` — each host
        reads only its slice, the per-epoch permutation is identical on
        every host (seeded sampler), and worker processes (not threads)
        do the decode, sidestepping the GIL for CPU-heavy transforms;
      * per-epoch reshuffling matches the ``set_epoch`` protocol: the
        sampler is rebuilt each epoch with seed ``[seed, epoch]`` and the
        dataset's own epoch-seeded augmentation stream is advanced before
        workers fork.

    Our datasets are stateless per ``(seed, epoch, idx)`` so records can
    be fetched from any process in any order. On a single host this
    yields the same global-batch semantics as ``BatchLoader``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        sharding=None,
        prefetch: int = 2,
        num_workers: int = 0,
    ):
        import grain.python as grain  # deferred: optional backend

        self._grain = grain
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.sharding = sharding
        self.num_workers = max(0, num_workers)
        self.epoch = 0
        self.proc_count = jax.process_count()
        self.proc_index = jax.process_index()
        if batch_size % self.proc_count:
            raise ValueError(
                f"batch_size {batch_size} must divide by process count "
                f"{self.proc_count} for the grain loader"
            )
        self.host_batch = batch_size // self.proc_count

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.dataset) // self.proc_count
        if self.drop_last:
            return n // self.host_batch
        return (n + self.host_batch - 1) // self.host_batch

    def __iter__(self):
        grain = self._grain
        sampler = grain.IndexSampler(
            num_records=len(self.dataset),
            shard_options=grain.ShardOptions(
                shard_index=self.proc_index,
                shard_count=self.proc_count,
                drop_remainder=True,
            ),
            shuffle=self.shuffle,
            seed=self.seed * 100_003 + self.epoch,
            num_epochs=1,
        )
        loader = grain.DataLoader(
            data_source=self.dataset,
            sampler=sampler,
            operations=[
                grain.Batch(self.host_batch, drop_remainder=self.drop_last)
            ],
            worker_count=self.num_workers,
        )
        for batch in loader:
            batch = dict(batch)
            short = self.host_batch - next(iter(batch.values())).shape[0]
            if short > 0:  # eval-tail padding, same contract as BatchLoader
                for k, v in batch.items():
                    filler = np.repeat(v[:1], short, axis=0)
                    if k != "image":
                        filler = np.full_like(filler, 255)
                    batch[k] = np.concatenate([v, filler], axis=0)
            yield self._put(batch)

    def _put(self, batch: Dict[str, np.ndarray]):
        if self.sharding is None:
            return batch
        if self.proc_count > 1:
            # each process holds only ITS record shard (host_batch rows);
            # assemble the global array from the per-process local data —
            # a plain device_put cannot target devices this process does
            # not own
            return {
                k: jax.make_array_from_process_local_data(self.sharding, v)
                for k, v in batch.items()
            }
        return jax.device_put(batch, self.sharding)
