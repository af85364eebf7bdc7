"""Checkpoint save/resume via Orbax.

TPU-native replacement for d2's DetectionCheckpointer/PeriodicCheckpointer
(train.py:113-123; SURVEY.md §5.4): saves {params, opt_state, step} every
CHECKPOINT_PERIOD, maintains a ``last_checkpoint`` pointer, and supports
  * --resume: continue from the latest checkpoint (restores step);
  * weights-only load (e.g. a converted torch/ImageNet init, see
    utils/torch_weights.py).
"""
from __future__ import annotations

import logging
import os
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class Checkpointer:
    def __init__(self, output_dir: str):
        self.dir = os.path.abspath(output_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    # ------------------------------------------------------------------ save
    def save(self, state, step: int):
        path = os.path.join(self.dir, f"model_{step:07d}")
        pure = flax.serialization.to_state_dict(state)
        # multi-process: every process participates (orbax coordinates the
        # shard writes); only the main process touches the marker file
        self._ckptr.save(path, pure, force=True)
        if jax.process_index() == 0:
            with open(os.path.join(self.dir, "last_checkpoint"), "w") as f:
                f.write(os.path.basename(path))
            logger.info("Saved checkpoint %s", path)
        return path

    # --------------------------------------------------------------- restore
    def latest_path(self) -> Optional[str]:
        marker = os.path.join(self.dir, "last_checkpoint")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            name = f.read().strip()
        path = os.path.join(self.dir, name)
        return path if os.path.exists(path) else None

    def restore(self, template_state, path: Optional[str] = None):
        """Restore a full TrainState (same structure as template_state).

        Arrays are materialized as host numpy: the checkpoint may have been
        written on a different backend/topology (e.g. saved on the TPU chip,
        restored on CPU), where orbax's default jax.Array deserialization
        demands the original shardings and fails.
        """
        path = path or self.latest_path()
        assert path, "no checkpoint to restore"
        template = jax.tree_util.tree_map(
            np.asarray, flax.serialization.to_state_dict(template_state)
        )
        restore_args = ocp.checkpoint_utils.construct_restore_args(template)
        restored = self._ckptr.restore(path, item=template, restore_args=restore_args)
        state = flax.serialization.from_state_dict(template_state, restored)
        logger.info("Restored checkpoint %s (step=%d)", path, int(state.step))
        return state

    def resume_or_load(self, template_state, weights: str = "", resume: bool = False):
        """d2-style policy: --resume continues from the latest checkpoint;
        otherwise load weights-only from ``weights`` if given."""
        if resume and self.latest_path():
            return self.restore(template_state), True
        if weights:
            params = load_weights_file(weights, template_state.params)
            return template_state.replace(params=params), False
        return template_state, False


def load_weights_file(path: str, params_template):
    """Load model weights from an orbax checkpoint dir or a converted-torch
    .npz (utils/torch_weights.py). Missing keys keep their initialized
    values; shape mismatches raise."""
    if os.path.isdir(path):
        restored = ocp.PyTreeCheckpointer().restore(path)
        src = restored.get("params", restored)
        return flax.serialization.from_state_dict(params_template, src)
    if path.endswith(".npz"):
        from ..utils.torch_weights import load_npz_into_params

        return load_npz_into_params(path, params_template)
    if path.endswith((".pkl", ".pth")):
        from ..utils.torch_weights import convert_torch_checkpoint

        return convert_torch_checkpoint(path, params_template)
    raise ValueError(f"unsupported weights file: {path}")
