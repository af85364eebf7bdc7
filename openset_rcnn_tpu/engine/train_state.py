"""Train state + the single jitted train step (SURVEY.md §7.1).

One ``train_step(state, batch, rng) -> (state, metrics)`` contains forward,
all six losses, backward, (sharded) gradient reduction, and the SGD update —
the TPU-native collapse of the reference's hot loop (train.py:132-148).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models import OpensetRCNNModule, training_losses_and_stats
from ..structures import ImageBatch


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )


def make_train_step(
    module: OpensetRCNNModule,
    tx: optax.GradientTransformation,
    spec,
    anchors,
    level_sizes: Sequence[int],
    lr_schedule: Callable | None = None,
    stop_frozen_grads: bool = True,
) -> Callable[[TrainState, ImageBatch, jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    anchors = jnp.asarray(anchors)

    def loss_fn(params, batch, rng):
        if stop_frozen_grads:
            # Frozen leaves (FrozenBN affines/statistics + stages below
            # FREEZE_AT) receive exactly-zero updates via the optax mask
            # (optimizer.py) — but without stop_gradient their cotangents
            # are still COMPUTED then discarded: every FrozenBN scale/bias
            # grad is a full per-channel reduction over its feature map.
            # stop_gradient makes those cotangents structurally zero so XLA
            # dead-code-eliminates the frozen backward subgraph (measured
            # NEUTRAL on the production config — XLA already fuses the
            # reductions into the conv fusions — but kept so the dead
            # compute stays dead on any config; PERFORMANCE.md round 5).
            # Updates are bit-identical: frozen updates were already zero,
            # and the global-norm clip sees only trainable leaves either way.
            from .optimizer import trainable_mask

            mask = trainable_mask(params, spec.freeze_at)
            params = jax.tree.map(
                lambda p, t: p if t else jax.lax.stop_gradient(p), params, mask
            )
        losses, stats = training_losses_and_stats(
            module, params, batch, rng, spec, anchors, level_sizes
        )
        total = sum(losses.values())
        return total, (losses, stats)

    def train_step(state: TrainState, batch: ImageBatch, rng: jax.Array):
        # Per-step RNG: fold in the step so resume is deterministic
        # (replaces the reference's global torch RNG stream).
        step_rng = jax.random.fold_in(rng, state.step)
        (total, (losses, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics.update(stats)
        metrics["total_loss"] = total
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        new_state = TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state)
        return new_state, metrics

    return train_step


def make_scan_train_step(
    module: OpensetRCNNModule,
    tx: optax.GradientTransformation,
    spec,
    anchors,
    level_sizes: Sequence[int],
    lr_schedule: Callable | None = None,
) -> Callable[[TrainState, ImageBatch, jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """K sequential SGD steps in ONE dispatch via ``lax.scan``.

    Takes an ImageBatch whose leaves carry a leading (K, B, ...) axis and
    runs K full train steps on-device, returning the LAST step's metrics.
    Semantically identical to K calls of ``make_train_step``'s fn (per-step
    RNG is folded from ``state.step`` inside, so the stream matches).
    Amortizes host->device dispatch — on tunneled/shared deployments each
    dispatch costs ~10-25 ms, a large fraction of a ~150 ms step.
    """
    step = make_train_step(module, tx, spec, anchors, level_sizes, lr_schedule)

    def scan_step(state: TrainState, batches: ImageBatch, rng: jax.Array):
        def body(st, b):
            return step(st, b, rng)

        state, metrics = jax.lax.scan(body, state, batches)
        return state, jax.tree.map(lambda x: x[-1], metrics)

    return scan_step
