"""Optimizer + LR schedule.

TPU-native equivalent of d2's ``build_optimizer`` / ``WarmupMultiStepLR``
(consumed at train.py:110-111; SURVEY.md §2.4): SGD with momentum 0.9 and
weight decay 1e-4, linear warmup (factor 1e-3 over WARMUP_ITERS) then x0.1
steps. Composition order matches torch SGD: wd is added to the gradient
BEFORE the momentum buffer, and the lr scales the momentum-accumulated
update.

Frozen parameters — all FrozenBN statistics/affines plus backbone stages
below FREEZE_AT (d2 semantics: 1 = stem, 2 = stem+res2) — receive exactly
zero update via an optax mask.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import optax

_FROZEN_BN_KEYS = {"scale", "bias", "mean", "var"}


def _is_frozen_bn_path(path) -> bool:
    names = [p.key for p in path if hasattr(p, "key")]
    if not names:
        return False
    return any(n.endswith("bn") or n.startswith("bn") for n in names[:-1]) and names[-1] in _FROZEN_BN_KEYS


def _frozen_stage_names(freeze_at: int):
    out = set()
    if freeze_at >= 1:
        out.update({"stem_conv", "stem_bn"})
    for s in range(2, freeze_at + 1):
        out.add(f"res{s}_block")  # prefix match
    return out


def trainable_mask(params, freeze_at: int):
    """Pytree of bools: True = trainable."""
    frozen_stages = _frozen_stage_names(freeze_at)

    def fn(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if _is_frozen_bn_path(path):
            return False
        if names and names[0] == "backbone" and len(names) > 1:
            n = names[1]
            for f in frozen_stages:
                if n == f or n.startswith(f):
                    return False
        return True

    return jax.tree_util.tree_map_with_path(fn, params)


def warmup_multistep_schedule(
    base_lr: float,
    steps,
    gamma: float,
    warmup_iters: int,
    warmup_factor: float,
    warmup_method: str = "linear",
) -> Callable:
    steps = tuple(int(s) for s in steps)

    def schedule(count):
        import jax.numpy as jnp

        it = count.astype(jnp.float32) if hasattr(count, "astype") else jnp.asarray(count, jnp.float32)
        if warmup_method == "constant":
            ramp = jnp.asarray(warmup_factor, jnp.float32)
        else:  # linear (d2 default)
            ramp = warmup_factor + (1.0 - warmup_factor) * it / max(warmup_iters, 1)
        warm = jnp.where(it < warmup_iters, ramp, 1.0)
        decay = 1.0
        for s in steps:
            decay = decay * jnp.where(it >= s, gamma, 1.0)
        return base_lr * warm * decay

    return schedule


def build_optimizer(cfg, params) -> tuple[optax.GradientTransformation, Callable]:
    sched = warmup_multistep_schedule(
        cfg.SOLVER.BASE_LR,
        cfg.SOLVER.STEPS,
        cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_ITERS,
        cfg.SOLVER.WARMUP_FACTOR,
        cfg.SOLVER.WARMUP_METHOD,
    )
    mask = trainable_mask(params, cfg.MODEL.BACKBONE.FREEZE_AT)
    inner = optax.chain(
        optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY),
        optax.trace(decay=cfg.SOLVER.MOMENTUM),
        optax.scale_by_schedule(sched),
        optax.scale(-1.0),
    )
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.get("CLIP_TYPE", "value") == "norm":
            clip = optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        else:
            clip = optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        inner = optax.chain(clip, inner)
    labels = jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask)
    tx = optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, param_labels=labels
    )
    return tx, sched
