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


# ---------------------------------------------------------------------------
# Active-mesh registry: lets Pallas call-sites wrap themselves in shard_map.
#
# XLA cannot partition a pallas_call (a custom call) across a GSPMD-sharded
# batch — it would replicate the kernel's inputs onto every device. The
# engine therefore records the mesh it jits over; kernel call-sites consult
# it AT TRACE TIME and wrap the pallas_call in jax.shard_map over the 'data'
# axis, so each device runs the kernel on its local batch shard (the
# recommended Pallas+sharding composition). Plain-XLA fallbacks never need
# the wrap — GSPMD partitions them natively.
# ---------------------------------------------------------------------------
_ACTIVE_MESH: Any = None


def set_active_mesh(mesh) -> None:
    """Record (or clear, with None) the mesh the engine is tracing under."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh():
    return _ACTIVE_MESH


class active_mesh_ctx:
    """Scoped set_active_mesh (the eval path sets its own mesh and must
    restore the training mesh afterwards — periodic eval runs mid-train)."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __enter__(self):
        self.prev = active_mesh()
        set_active_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_active_mesh(self.prev)


def in_manual_mesh() -> bool:
    """True when tracing inside a shard_map body: values here are one
    device's block, so a pallas_call is safe without further wrapping."""
    m = jax.sharding.get_abstract_mesh()
    if m.empty:
        return False
    try:
        return all("Manual" in str(t) for t in m.axis_types)
    except Exception:
        return True


def pallas_device_local() -> bool:
    """A pallas_call traced HERE operates on a single device's data."""
    return jax.device_count() == 1 or in_manual_mesh()


def data_shard_map(fn, in_specs, out_specs):
    """shard_map ``fn`` over the active mesh (identity when none is active
    or we are already inside a shard_map body)."""
    mesh = active_mesh()
    if mesh is None or in_manual_mesh():
        return fn
    # check_vma=False: pallas_call emits ShapeDtypeStructs without varying-
    # manual-axes annotations, which the checker (jax>=0.8) rejects; the
    # in/out specs here are total, so the check adds nothing.
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def host_replicated_copy(tree, mesh: Mesh):
    """Host numpy copy of a (possibly model-sharded, possibly multi-process)
    pytree: an identity jit with replicated out_shardings allgathers each
    leaf, after which every process can read it locally."""
    rep = NamedSharding(mesh, P())
    gathered = jax.jit(
        lambda t: t, out_shardings=jax.tree.map(lambda _: rep, tree)
    )(tree)
    return jax.tree.map(np.asarray, gathered)


def put_host_tree(tree, shard_tree):
    """Place a host pytree (identical on every process) onto shardings that
    may span processes.

    Single process: plain device_put. Multi-process: ``jax.device_put``
    cannot target non-addressable devices, so each process supplies its
    addressable shards through ``make_array_from_callback`` — every process
    holds the full host value, the callback slices out the local pieces.
    This is the state/RNG placement step of the multi-process launch
    (replaces DDP's implicit parameter broadcast, ref train.py:201-205)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shard_tree)

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(put, tree, shard_tree)
