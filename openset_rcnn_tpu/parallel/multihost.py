"""Multi-host utilities.

TPU-native replacement for d2's ``comm`` module (SURVEY.md §5.8): metric
gather and logging reductions across JAX processes. On a single process
these are identity operations; in a multi-host run they ride
``jax.experimental.multihost_utils`` (allgather over the global mesh)
instead of torch.distributed/NCCL.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def is_main_process() -> bool:
    return jax.process_index() == 0


def num_processes() -> int:
    return jax.process_count()


_distributed_initialized = False


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Single-controller init (replaces d2 `launch`, train.py:287-294).

    On Cloud TPU pods, jax.distributed.initialize() autodetects the
    coordinator / process topology; the explicit address + (num_processes,
    process_id) — the CLI's --dist-url / --num-machines / --machine-rank —
    are for manual clusters where autodetection is unavailable.

    MUST run before any backend-touching jax call (jax.devices(),
    jax.process_count(), jit, ...): querying the backend first finalizes a
    local single-process client and the pod init becomes a no-op. We track
    our own guard flag instead of asking jax for that reason.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Raised when the distributed service already exists (e.g. a test
        # harness initialized it) — safe to proceed on the existing client.
        if "already" not in str(e).lower():
            raise
    _distributed_initialized = True


def gather_object(obj: Any) -> List[Any]:
    """Gather a picklable host object from every process (comm.gather
    equivalent used by the evaluators, os_coco_evaluation.py:163-169).
    Returns the full list on every process."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # pad to equal lengths across hosts
    n = np.asarray([len(payload)], np.int64)
    all_n = multihost_utils.process_allgather(n)
    max_n = int(all_n.max())
    padded = np.zeros(max_n, np.uint8)
    padded[: len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(all_n[i, 0])].tobytes())
        for i in range(gathered.shape[0])
    ]


def reduce_dict(metrics: Dict[str, float]) -> Dict[str, float]:
    """Mean of scalar metrics across processes (comm.reduce_dict
    equivalent, train.py:139)."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = np.asarray([float(metrics[k]) for k in keys], np.float32)
    allv = multihost_utils.process_allgather(vec)
    mean = np.asarray(allv).mean(axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}
