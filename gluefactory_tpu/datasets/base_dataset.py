"""Dataset base class and batch loader.

Counterpart of reference gluefactory/datasets/base_dataset.py:25-207
(conf-merged datasets + torch DataLoader factory). TPU adaptation: datasets
produce numpy samples on the host; `get_data_loader` returns a simple
multi-worker-free prefetching iterator that collates fixed-shape batches
(TPU requires static shapes, so variable-size fields must already be padded
by the dataset). A LoopLoader mirrors the reference's overfit mode
(base_dataset.py:184-206).
"""

from __future__ import annotations

import collections.abc
import queue
import threading
from typing import Any, ClassVar, Iterator, Mapping

import numpy as np

from ..utils.config import FrozenConfig, merge


def collate(samples: list) -> dict:
    """Stack a list of sample dicts into batched numpy arrays (counterpart of
    the reference's custom collate, base_dataset.py:47-97)."""
    elem = samples[0]
    if isinstance(elem, Mapping):
        return {k: collate([s[k] for s in samples]) for k in elem}
    if isinstance(elem, (str, bytes)):
        return list(samples)
    if isinstance(elem, np.ndarray):
        return np.stack(samples, 0)
    if isinstance(elem, (int, float, bool, np.number)):
        return np.asarray(samples)
    if elem is None:
        return None
    if isinstance(elem, collections.abc.Sequence):
        return [collate(list(x)) for x in zip(*samples)]
    # geometry pytrees (Pose/Camera) stack leaf-wise
    import jax

    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs], 0), *samples)


class _PrefetchIterator:
    """Background-thread prefetch of collated batches. Exposes `.dataset`
    (the underlying indexable split) like torch's DataLoader so consumers —
    e.g. the interactive eval browser — can random-access samples."""

    def __init__(self, make_batches, prefetch: int = 2, dataset=None):
        self.dataset = dataset
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._done = object()
        self._thread = threading.Thread(
            target=self._worker, args=(make_batches,), daemon=True
        )
        self._thread.start()

    def _worker(self, make_batches):
        try:
            for batch in make_batches():
                self._queue.put(batch)
        finally:
            self._queue.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._done:
            raise StopIteration
        return item


class BaseDataset:
    """Subclasses define default_conf, `_init(conf)`, and either
    `get_dataset(split)` returning an indexable dataset, or override
    `iter_samples(split, epoch)`."""

    base_default_conf: ClassVar[dict] = {
        "name": None,
        "num_workers": 0,
        "train_batch_size": 2,
        "val_batch_size": 2,
        "test_batch_size": 1,
        "batch_size": None,  # overrides per-split sizes if set
        "shuffle_training": True,
        "seed": 0,
        "prefetch": 2,
    }
    default_conf: ClassVar[dict] = {}

    def __init__(self, conf=None):
        merged = merge(self.base_default_conf, self.default_conf, conf or {})
        self.conf = FrozenConfig(merged)
        self._init(self.conf)

    def _init(self, conf):
        pass

    # -------------------------------------------------------------- loaders
    def get_dataset(self, split: str):
        raise NotImplementedError

    def batch_size(self, split: str) -> int:
        if self.conf.get("batch_size"):
            return int(self.conf.batch_size)
        return int(self.conf.get(f"{split}_batch_size"))

    def get_data_loader(
        self, split: str, shuffle: bool | None = None, epoch: int = 0,
        distributed: bool = False, world_size: int = 1, rank: int = 0,
    ) -> Iterator[dict]:
        """Iterate collated batches for a split. `distributed` shards the
        index space across (world_size, rank) like DistributedSampler
        (reference base_dataset.py:165-166) — with single-controller JAX the
        usual mode is one process feeding the whole mesh, so the default is
        no sharding."""
        dataset = self.get_dataset(split)
        if hasattr(dataset, "set_epoch"):
            # per-epoch sample RNG: deterministic (reproducible runs, and
            # multi-process training needs every process to generate the
            # SAME global batch) yet varying across epochs
            dataset.set_epoch(epoch)
        bs = self.batch_size(split)
        if len(dataset) < bs:
            raise ValueError(
                f"Split {split!r} has {len(dataset)} samples < batch size {bs}; "
                "static-shape batching drops incomplete batches"
            )
        if shuffle is None:
            shuffle = split == "train" and self.conf.shuffle_training

        num_workers = int(self.conf.num_workers)

        def make_batches():
            n = len(dataset)
            order = np.arange(n)
            if shuffle:
                rng = np.random.RandomState(self.conf.seed + epoch)
                rng.shuffle(order)
            if distributed:
                order = order[rank::world_size]
            starts = range(0, len(order) - bs + 1, bs)
            if num_workers > 0:
                # thread pool: cv2/numpy sample construction releases the GIL
                # (counterpart of the reference's DataLoader worker processes)
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(num_workers) as pool:
                    for start in starts:
                        samples = list(
                            pool.map(
                                lambda i: dataset[int(i)], order[start : start + bs]
                            )
                        )
                        yield collate(samples)
            else:
                for start in starts:
                    samples = [dataset[int(i)] for i in order[start : start + bs]]
                    yield collate(samples)

        return _PrefetchIterator(
            make_batches, prefetch=int(self.conf.prefetch), dataset=dataset
        )

    def get_overfit_loader(self, split: str, length: int = 100):
        """Repeat one batch forever-ish (reference LoopSampler overfit mode)."""
        dataset = self.get_dataset(split)
        if hasattr(dataset, "set_epoch"):
            # per-epoch sample RNG: deterministic (reproducible runs, and
            # multi-process training needs every process to generate the
            # SAME global batch) yet varying across epochs
            dataset.set_epoch(epoch)
        bs = self.batch_size(split)
        batch = collate([dataset[i % len(dataset)] for i in range(bs)])

        def make_batches():
            for _ in range(length):
                yield batch

        return _PrefetchIterator(make_batches, prefetch=1, dataset=dataset)


def get_dataset(name: str):
    """Registry (reference datasets/__init__.py:7-25)."""
    import importlib.util

    base = __name__.rsplit(".", 1)[0]
    for path in (name, f"{base}.{name}"):
        if importlib.util.find_spec(path) is not None:
            mod = __import__(path, fromlist=[""])
            main = getattr(mod, "__main_dataset__", None)
            if main is not None:
                return main
            classes = [
                v
                for v in mod.__dict__.values()
                if isinstance(v, type)
                and issubclass(v, BaseDataset)
                and v is not BaseDataset
            ]
            if len(classes) == 1:
                return classes[0]
    raise RuntimeError(f"Dataset {name} not found")


__all__ = ["BaseDataset", "get_dataset", "collate"]
