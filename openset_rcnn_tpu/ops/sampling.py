"""Balanced random subsampling with fixed shapes.

TPU-native equivalent of detectron2's ``subsample_labels`` (consumed at
classification_free_rpn.py:299-316 and by ROI proposal sampling). The
reference gathers dynamic index lists; on TPU we instead produce masks /
fixed-size index sets via random ranking: draw a uniform key per element,
rank the candidates by key, and keep ranks below the (data-dependent but
scalar) quota. This is exactly a uniform random subset of the quota size.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _rank_within(mask: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Random rank of each element among mask==True elements (0-based).

    Elements with mask==False get rank >= num_true. Used where the full
    permutation is genuinely needed (ROI gather sampling).
    """
    n = mask.shape[0]
    r = jax.random.uniform(key, (n,))
    # Non-members sort after all members.
    sort_key = jnp.where(mask, r, 2.0)
    order = jnp.argsort(sort_key)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return ranks


def _random_subset_mask(
    mask: jnp.ndarray, quota: jnp.ndarray, cap: int, key: jax.Array
) -> jnp.ndarray:
    """Mask of a uniform random subset of min(quota, cap, #mask) members.

    TPU-friendly: a k=cap ``top_k`` over random keys replaces a full argsort
    over N (the anchor sets are ~100k; cap is 256) — ranking members by iid
    uniforms and keeping the first `quota` IS a uniform random subset.
    """
    n = mask.shape[0]
    r = jax.random.uniform(key, (n,))
    vals = jnp.where(mask, r, -1.0)
    _, top_idx = jax.lax.top_k(vals, cap)
    slot_ok = jnp.arange(cap) < quota
    out = jnp.zeros((n,), bool).at[top_idx].set(slot_ok, mode="drop")
    # entries selected by padding top_k slots (vals == -1) must stay False
    return out & mask


def subsample_labels(
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    key: jax.Array,
) -> jnp.ndarray:
    """Return labels with unsampled entries overwritten to -1 (ignore).

    Matches d2 semantics: num_pos = min(#pos, int(num_samples * frac));
    num_neg = min(#neg, num_samples - num_pos).

    Args:
        labels: (N,) int in {-1, 0, 1}.
    Returns:
        (N,) int32 in {-1, 0, 1} with exactly num_pos ones and num_neg zeros.
    """
    kp, kn = jax.random.split(key)
    pos = labels == 1
    neg = labels == 0
    num_pos_target = int(num_samples * positive_fraction)
    num_pos = jnp.minimum(pos.sum(), num_pos_target)
    num_neg = jnp.minimum(neg.sum(), num_samples - num_pos)

    pos_keep = _random_subset_mask(pos, num_pos, num_samples, kp)
    neg_keep = _random_subset_mask(neg, num_neg, num_samples, kn)

    out = jnp.full_like(labels, -1)
    out = jnp.where(pos_keep, 1, out)
    out = jnp.where(neg_keep, 0, out)
    return out.astype(jnp.int32)


class SampledIndices(NamedTuple):
    indices: jnp.ndarray  # (num_samples,) int32 gather indices
    is_pos: jnp.ndarray   # (num_samples,) bool
    valid: jnp.ndarray    # (num_samples,) bool (False = padding slot)


def sample_balanced_indices(
    pos_mask: jnp.ndarray,
    neg_mask: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    key: jax.Array,
) -> SampledIndices:
    """Fixed-size gather-index variant used by ROI sampling.

    Selects min(#pos, frac*S) positives and fills the remainder with
    negatives (d2 ``subsample_labels`` + concat semantics at
    osrcnn_roi_heads.py:195-204). Returns exactly ``num_samples`` indices;
    if fewer candidates exist, trailing slots have valid=False.
    """
    kp, kn, kt = jax.random.split(key, 3)
    n = pos_mask.shape[0]
    num_pos_target = int(num_samples * positive_fraction)
    num_pos = jnp.minimum(pos_mask.sum(), num_pos_target)
    num_neg = jnp.minimum(neg_mask.sum(), num_samples - num_pos)

    pos_keep = pos_mask & (_rank_within(pos_mask, kp) < num_pos)
    neg_keep = neg_mask & (_rank_within(neg_mask, kn) < num_neg)

    # Order: selected positives first, then selected negatives, then the rest;
    # random tiebreak inside each class. Take the first num_samples indices.
    tie = jax.random.uniform(kt, (n,))
    sort_key = jnp.where(pos_keep, 0.0, jnp.where(neg_keep, 1.0, 2.0)) + tie * 0.5
    order = jnp.argsort(sort_key)
    idx = order[:num_samples].astype(jnp.int32)

    slot = jnp.arange(num_samples, dtype=jnp.int32)
    is_pos = slot < num_pos
    valid = slot < (num_pos + num_neg)
    return SampledIndices(indices=idx, is_pos=is_pos, valid=valid)
