"""Device mesh + sharding rules.

TPU-native replacement for the reference's NCCL DDP launcher
(SURVEY.md §2.2, §5.8): a single-controller 2D ('data', 'model') mesh.
The batch is sharded on 'data' (gradient psum over ICI replaces DDP
allreduce); the large ROI-head FC kernels are sharded on 'model'
(tensor parallelism for the densest matmuls). Everything else is
replicated — the R50-FPN trunk fits comfortably per chip.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """A mesh over the first data*model visible devices — like the
    reference's --num-gpus, which may use a subset of the host's GPUs
    (ref train.py:287-294)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    return Mesh(np.asarray(devices[: data * model]).reshape(data, model), ("data", "model"))


# Param-path suffixes sharded on the model axis: (pytree path regex-free
# matching by (module, leaf) names) -> PartitionSpec.
_MODEL_SHARDED = {
    ("box_head", "fc1", "kernel"): P(None, "model"),
    ("box_head", "fc1", "bias"): P("model"),
    ("box_head", "fc2", "kernel"): P("model", None),
}


def param_sharding(params, mesh: Mesh):
    """NamedSharding pytree: FC1/FC2 of the box head are tensor-parallel
    (12544x1024 and 1024x1024 matmuls), all else replicated."""

    def fn(path, leaf):
        names = tuple(p.key for p in path if hasattr(p, "key"))
        for pat, spec in _MODEL_SHARDED.items():
            if len(names) >= len(pat) and tuple(names[-len(pat):]) == pat:
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(fn, params)


def batch_sharding(mesh: Mesh):
    """Leading (batch) axis sharded over 'data' for every leaf."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
