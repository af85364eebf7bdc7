"""Inference harness: drive eval over a dataset and score it.

Equivalent of d2's ``inference_on_dataset`` (train.py:96, SURVEY.md §3.2):
compiled device forward per image bucket, host cascade, evaluator feeding.
The jit cache keys on the (static) bucket shape, so at most two compiled
graphs exist (landscape/portrait).
"""
from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ModelSpec, OpensetRCNNModule, compute_anchors, inference_forward
from .postprocess import PostprocessConfig, postprocess_image

logger = logging.getLogger(__name__)


class CompiledInference:
    """Caches a jitted inference function per image bucket."""

    def __init__(self, module: OpensetRCNNModule, params, spec: ModelSpec):
        self.module = module
        self.params = params
        self.spec = spec
        self._cache: Dict[tuple, Callable] = {}

    def __call__(self, images: jnp.ndarray, image_hw: jnp.ndarray):
        bucket = tuple(images.shape[1:3])
        if bucket not in self._cache:
            anchors, level_sizes = compute_anchors(self.spec, bucket)
            anchors = jnp.asarray(anchors)
            spec, module = self.spec, self.module

            def fn(params, images, image_hw):
                return inference_forward(module, params, images, image_hw, spec, anchors, level_sizes)

            self._cache[bucket] = jax.jit(fn)
            logger.info("compiled inference for bucket %s", bucket)
        return self._cache[bucket](self.params, images, image_hw)


def inference_on_dataset(
    infer: CompiledInference,
    loader,
    evaluator,
    post_cfg: PostprocessConfig,
) -> Dict[str, float]:
    evaluator.reset()
    n_images = 0
    t0 = time.perf_counter()
    for batch, meta in loader:
        raw = infer(batch.images, batch.image_hw)
        raw_np = jax.tree.map(np.asarray, raw)
        for i, image_id in enumerate(meta.image_ids):
            dets = postprocess_image(
                raw_np.boxes[i],
                raw_np.objectness[i],
                raw_np.min_dist[i],
                raw_np.pln_class[i],
                raw_np.known_probs[i],
                raw_np.valid[i],
                meta.input_hw[i],
                meta.original_hw[i],
                post_cfg,
            )
            evaluator.process(image_id, dets.boxes, dets.scores, dets.classes)
            n_images += 1
    dt = time.perf_counter() - t0
    if n_images:
        logger.info("inference done: %d images in %.1fs (%.2f img/s)", n_images, dt, n_images / dt)
    return evaluator.evaluate()
