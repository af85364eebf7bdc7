"""Host input pipeline: threaded decode/augment -> device-ready batches.

Rebuilds the reference's d2 train/test loaders (SURVEY.md §2.4: infinite
shuffled stream, aspect-ratio grouping, per-worker sharding) TPU-style:
  * aspect-ratio grouping feeds the TWO static buckets (landscape/portrait)
    so jit sees at most two shapes;
  * a thread pool decodes/augments ahead of the device (the C++ work — JPEG
    decode, resize — already runs outside the GIL inside cv2);
  * deterministic: stream order is a pure function of (seed, epoch, shard).
"""
from __future__ import annotations

import itertools
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..structures import GroundTruth, ImageBatch
from .transforms import DetectionTransform, TransformedExample


class BatchMeta:
    """Host-side metadata travelling alongside an ImageBatch."""

    def __init__(self, examples: List[TransformedExample]):
        self.image_ids = [e.image_id for e in examples]
        self.input_hw = [e.image_hw for e in examples]
        self.original_hw = [e.original_hw for e in examples]
        self.bucket_hw = examples[0].bucket_hw


def collate(examples: List[TransformedExample]) -> Tuple[ImageBatch, BatchMeta]:
    images = jnp.asarray(np.stack([e.image for e in examples]))
    image_hw = jnp.asarray([e.image_hw for e in examples], jnp.float32)
    gt = GroundTruth(
        boxes=jnp.asarray(np.stack([e.boxes for e in examples])),
        classes=jnp.asarray(np.stack([e.classes for e in examples])),
        valid=jnp.asarray(np.stack([e.gt_valid for e in examples])),
    )
    return ImageBatch(images=images, image_hw=image_hw, gt=gt), BatchMeta(examples)


def _filter_empty(records: List[dict]) -> List[dict]:
    return [r for r in records if any(
        a["bbox"][2] > a["bbox"][0] and a["bbox"][3] > a["bbox"][1]
        for a in r.get("annotations", [])
    )]


class TrainLoader:
    """Infinite stream of homogeneous-bucket batches."""

    def __init__(
        self,
        records: List[dict],
        transform: DetectionTransform,
        batch_size: int,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
        filter_empty: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
    ):
        if filter_empty:
            records = _filter_empty(records)
        assert records, "no usable training records"
        self.records = records
        self.transform = transform
        self.batch_size = batch_size
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    def _index_stream(self) -> Iterator[int]:
        epoch = 0
        while True:
            rng = np.random.RandomState((self.seed, epoch))
            order = rng.permutation(len(self.records))
            for i in order[self.shard_id :: self.num_shards]:
                yield int(i)
            epoch += 1

    def __iter__(self) -> Iterator[Tuple[ImageBatch, BatchMeta]]:
        idx_stream = self._index_stream()
        lock = threading.Lock()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.batch_size)
        counter = itertools.count()

        def worker(wid: int):
            rng = np.random.RandomState((self.seed, 7919, self.shard_id, wid))
            while True:
                with lock:
                    i = next(idx_stream)
                    seq = next(counter)
                ex = self.transform(self.records[i], rng)
                if ex is not None and ex.gt_valid.any():
                    out_q.put((seq, ex))

        for wid in range(self.num_workers):
            threading.Thread(target=worker, args=(wid,), daemon=True).start()

        # aspect-ratio grouping: collect per-bucket until one fills
        groups = {}
        while True:
            _, ex = out_q.get()
            groups.setdefault(ex.bucket_hw, []).append(ex)
            g = groups[ex.bucket_hw]
            if len(g) == self.batch_size:
                yield collate(g)
                groups[ex.bucket_hw] = []


class EvalLoader:
    """Sequential loader; batches are bucket-homogeneous (batch_size=1 by
    default, matching the reference's per-GPU test batching, train.py:95)."""

    def __init__(self, records: List[dict], transform: DetectionTransform, batch_size: int = 1):
        self.records = records
        self.transform = transform
        self.batch_size = batch_size

    def __len__(self):
        return len(self.records)

    def __iter__(self) -> Iterator[Tuple[ImageBatch, BatchMeta]]:
        rng = np.random.RandomState(0)  # test transform is deterministic
        group: List[TransformedExample] = []
        for rec in self.records:
            ex = self.transform(rec, rng)
            if ex is None:
                continue
            if group and ex.bucket_hw != group[0].bucket_hw:
                yield collate(group)
                group = []
            group.append(ex)
            if len(group) == self.batch_size:
                yield collate(group)
                group = []
        if group:
            yield collate(group)


def device_prefetch(iterator, depth: int = 2):
    """Stage upcoming batches onto the device from a background thread.

    Replaces d2's GPU-side prefetching worker semantics: while the current
    step runs, the next batch's host->device transfer is already in flight,
    so the device never waits on PCIe/host.
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        for batch, meta in iterator:
            q.put((jax.device_put(batch), meta))
        q.put(_END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
