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
    """Host-side metadata travelling alongside an ImageBatch.

    ``n_real``: number of genuine examples — a final partial eval batch is
    padded up to the static batch size by repeating its last example, and
    the metadata lists are truncated so consumers iterate real images only.
    """

    def __init__(self, examples: List[TransformedExample], n_real: Optional[int] = None):
        n = len(examples) if n_real is None else n_real
        self.image_ids = [e.image_id for e in examples[:n]]
        self.input_hw = [e.image_hw for e in examples[:n]]
        self.original_hw = [e.original_hw for e in examples[:n]]
        self.bucket_hw = examples[0].bucket_hw


def collate(
    examples: List[TransformedExample], n_real: Optional[int] = None
) -> Tuple[ImageBatch, BatchMeta]:
    images = jnp.asarray(np.stack([e.image for e in examples]))
    image_hw = jnp.asarray([e.image_hw for e in examples], jnp.float32)
    gt = GroundTruth(
        boxes=jnp.asarray(np.stack([e.boxes for e in examples])),
        classes=jnp.asarray(np.stack([e.classes for e in examples])),
        valid=jnp.asarray(np.stack([e.gt_valid for e in examples])),
    )
    return ImageBatch(images=images, image_hw=image_hw, gt=gt), BatchMeta(examples, n_real)


def _filter_empty(records: List[dict]) -> List[dict]:
    return [r for r in records if any(
        a["bbox"][2] > a["bbox"][0] and a["bbox"][3] > a["bbox"][1]
        for a in r.get("annotations", [])
    )]


class TrainLoader:
    """Infinite stream of homogeneous-bucket batches.

    Sharding is by GLOBAL-BATCH BLOCK, not by stride: every process computes
    the identical sequence of global batches (a pure function of the record
    metadata + seed) and takes its contiguous ``batch_size`` slice of each.
    Concatenating all shards therefore reproduces the single-process global
    batch exactly — training is invariant to the process layout (the
    reference's strided d2 sharding has no such property; its per-GPU
    batches never form one array). Aspect-ratio grouping likewise runs on
    record metadata (``width``/``height``), so all processes group
    identically without decoding a single image.
    """

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

    def _is_landscape(self, rec: dict) -> bool:
        """Bucket from metadata: resize preserves aspect, so w >= h predicts
        the transform's landscape/portrait choice exactly (transforms.py
        bucket_for). Records without size metadata default to landscape."""
        w, h = rec.get("width"), rec.get("height")
        if w is None or h is None:
            return True
        return w >= h

    def _block_stream(self) -> Iterator[List[int]]:
        """Global batches of record indices — identical on every process.
        Per-epoch permutation feeds two aspect-grouped queues; whichever
        reaches the global batch size first emits a block."""
        gbs = self.batch_size * self.num_shards
        pending = {True: [], False: []}
        epoch = 0
        while True:
            rng = np.random.RandomState((self.seed, epoch))
            for i in rng.permutation(len(self.records)):
                q = pending[self._is_landscape(self.records[int(i)])]
                q.append(int(i))
                if len(q) == gbs:
                    yield list(q)
                    q.clear()
            epoch += 1

    def _example_stream(self) -> Iterator[Tuple[int, int]]:
        """(global_seq, record_index) for THIS shard. global_seq numbers the
        example within the global stream, so the augmentation RNG — and with
        it the produced pixels — is invariant to the shard layout."""
        bs = self.batch_size
        lo = self.shard_id * bs
        for bi, block in enumerate(self._block_stream()):
            for j, idx in enumerate(block[lo : lo + bs]):
                yield bi * bs * self.num_shards + lo + j, idx

    def _placeholder(self, rec: dict):
        """Lockstep filler for an unreadable image: black pixels, no GT.
        Dropping the slot would desynchronise the global batch composition
        across processes."""
        bh, bw = self.transform.bucket_hw
        if not self._is_landscape(rec):
            bh, bw = bw, bh
        mg = self.transform.max_gt
        return TransformedExample(
            image=np.zeros((bh, bw, 3), np.uint8),
            image_hw=(bh, bw),
            original_hw=(bh, bw),
            bucket_hw=(bh, bw),
            boxes=np.zeros((mg, 4), np.float32),
            classes=np.zeros((mg,), np.int32),
            gt_valid=np.zeros((mg,), bool),
            image_id=rec.get("image_id"),
        )

    def __iter__(self) -> Iterator[Tuple[ImageBatch, BatchMeta]]:
        """Deterministic: batch composition and augmentations are a pure
        function of (seed, epoch) — independent of worker count AND shard
        layout. Workers transform in parallel but (a) each example's
        augmentation RNG derives from its global sequence number, and
        (b) the consumer reorders completed examples back into sequence
        order before batching, so the thread schedule cannot change the
        stream."""
        stream = self._example_stream()
        lock = threading.Lock()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.batch_size)
        counter = itertools.count()

        def worker():
            while True:
                with lock:
                    seq = next(counter)
                    gseq, i = next(stream)
                rng = np.random.RandomState((self.seed, 7919, gseq))
                ex = self.transform(self.records[i], rng)
                if ex is None:
                    ex = self._placeholder(self.records[i])
                out_q.put((seq, ex))

        for _ in range(self.num_workers):
            threading.Thread(target=worker, daemon=True).start()

        # reorder buffer: release examples strictly in sequence order
        def ordered_stream():
            pending = {}
            want = 0
            while True:
                while want not in pending:
                    seq, ex = out_q.get()
                    pending[seq] = ex
                yield pending.pop(want)
                want += 1

        # blocks are bucket-homogeneous by construction: batch every
        # consecutive batch_size examples
        buf: List[TransformedExample] = []
        for ex in ordered_stream():
            buf.append(ex)
            if len(buf) == self.batch_size:
                yield collate(buf)
                buf = []


class EvalLoader:
    """Sequential loader with per-bucket batch accumulation.

    The reference evaluates at batch 1/GPU (train.py:95); on the TPU each
    dispatch costs a host<->device round trip (~25 ms on the tunneled
    deployment), so eval batches default bigger. Batches stay
    bucket-homogeneous by accumulating landscape/portrait groups
    independently; final partial groups are padded to the static batch size
    (BatchMeta.n_real masks the pads) so jit sees ONE shape per bucket.
    """

    def __init__(
        self,
        records: List[dict],
        transform: DetectionTransform,
        batch_size: int = 1,
        pad_final: bool = True,
    ):
        self.records = records
        self.transform = transform
        self.batch_size = batch_size
        self.pad_final = pad_final

    def __len__(self):
        return len(self.records)

    def __iter__(self) -> Iterator[Tuple[ImageBatch, BatchMeta]]:
        rng = np.random.RandomState(0)  # test transform is deterministic
        groups = {}
        for rec in self.records:
            ex = self.transform(rec, rng)
            if ex is None:
                continue
            groups.setdefault(ex.bucket_hw, []).append(ex)
            g = groups[ex.bucket_hw]
            if len(g) == self.batch_size:
                yield collate(g)
                groups[ex.bucket_hw] = []
        for g in groups.values():
            if not g:
                continue
            n_real = len(g)
            if self.pad_final and n_real < self.batch_size:
                g = g + [g[-1]] * (self.batch_size - n_real)
            yield collate(g, n_real)


def device_prefetch(iterator, depth: int = 2, sharding=None):
    """Stage upcoming batches onto the device from a background thread.

    Replaces d2's GPU-side prefetching worker semantics: while the current
    step runs, the next batch's host->device transfer is already in flight,
    so the device never waits on PCIe/host.

    ``sharding``: optional NamedSharding pytree-broadcastable over the batch
    — batches are placed sharded (data-parallel split over the mesh's
    'data' axis) instead of on the default device. In a multi-process run
    each process feeds its local shard and the global array is assembled
    with ``jax.make_array_from_process_local_data``.
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def place(batch):
        if sharding is None:
            return jax.device_put(batch)
        if jax.process_count() > 1:
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
                batch,
            )
        return jax.device_put(batch, sharding)

    def worker():
        for batch, meta in iterator:
            q.put((place(batch), meta))
        q.put(_END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
