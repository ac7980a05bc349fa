"""Sharding policy: parameters, batches, and activation constraints.

The reference replicates every parameter and shards only the batch
(/root/reference/claude_distributed/distributed_train.py:107-109,189-196), relying
on XLA to all-reduce gradients. This module keeps that as the default but
declares the policy once, as data:

* :func:`param_shardings` — path-pattern rules mapping each parameter to a
  PartitionSpec (Megatron column/row TP for attention + MLP matmuls, ZeRO-style
  FSDP over the largest divisible axis, replication otherwise).
* :func:`batch_sharding` / :func:`shard_process_local_batch` — global batch
  ingest, single- and multi-host.
* :func:`constrain` — logical activation sharding constraints that no-op when no
  mesh is active, so model code stays mesh-agnostic.
"""

from __future__ import annotations

import re
from contextlib import contextmanager
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AxisName = Union[str, Tuple[str, ...], None]

# ---------------------------------------------------------------------------
# Active-mesh context (activation constraints)
# ---------------------------------------------------------------------------

_ACTIVE_MESH: List[Mesh] = []


@contextmanager
def activate_mesh(mesh: Optional[Mesh]):
    """Make ``mesh`` visible to :func:`constrain` during tracing."""
    if mesh is None:
        yield
        return
    _ACTIVE_MESH.append(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH.pop()


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH[-1] if _ACTIVE_MESH else None


def _axis_size(mesh: Mesh, axis: AxisName) -> int:
    if axis is None:
        return 1
    if isinstance(axis, tuple):
        size = 1
        for a in axis:
            size *= mesh.shape.get(a, 1)
        return size
    return mesh.shape.get(axis, 1)


def _prune_spec_for_shape(mesh: Mesh, shape: Sequence[int], axes: Sequence[AxisName]) -> P:
    """Drop any spec entry whose mesh-axis product doesn't divide the dim."""
    out = []
    for dim, axis in zip(shape, axes):
        if axis is None:
            out.append(None)
            continue
        names = axis if isinstance(axis, tuple) else (axis,)
        if any(a not in mesh.shape for a in names):
            out.append(None)
            continue
        size = _axis_size(mesh, axis)
        out.append(axis if (size > 1 and dim % size == 0) else None)
    # pad remaining dims with None implicitly (PartitionSpec does this)
    return P(*out)


def constrain(x: jax.Array, *axes: AxisName) -> jax.Array:
    """Apply a sharding constraint by logical axes; no-op without an active mesh.

    Example: ``constrain(x, ("data", "fsdp"), None, "tensor")``.
    """
    mesh = active_mesh()
    if mesh is None:
        return x
    spec = _prune_spec_for_shape(mesh, x.shape, list(axes) + [None] * (x.ndim - len(axes)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


# ---------------------------------------------------------------------------
# Mesh plumbing for Pallas kernels. pallas_call is opaque to GSPMD: under a
# sharded mesh a kernel must either be shard_mapped over the batch grid
# (embarrassingly parallel) or the caller must fall back to an XLA impl that
# the partitioner handles natively. Dispatch decisions are recorded
# (trace-time) so the multichip dryrun can assert which backend actually ran.
# ---------------------------------------------------------------------------

_dispatch_log: list = []


def dispatch_log() -> tuple:
    """Trace-time record of (op, impl, sharding) dispatch decisions."""
    return tuple(_dispatch_log)


def clear_dispatch_log() -> None:
    _dispatch_log.clear()


def log_dispatch(op: str, impl: str, axes) -> None:
    # bounded: long curriculum runs retrace per shape bucket; consumers
    # (dryrun, tests) clear_dispatch_log() around the region they assert on
    if len(_dispatch_log) < 4096:
        _dispatch_log.append((op, impl, tuple(axes) if axes else None))


def mesh_info(batch: int, *, tensor_safe: bool = True):
    """(mesh, axes) for shard_mapping a batch-parallel Pallas call.

    Returns (None, None) when no mesh is active or every axis has size 1
    (single-chip semantics — call the kernel directly); (mesh, None) when a
    sharded mesh is active but the kernel cannot be safely shard_mapped (the
    caller must fall back to an XLA impl); (mesh, axes) when shard_map over
    ``axes`` is safe.

    tensor_safe=False marks call sites whose operands are SHARDED ON THE
    TENSOR AXIS (attention q/k/v heads follow the column-parallel QKV split):
    a batch-only shard_map would all-gather those dims on entry and compute
    them redundantly on every tensor shard, so any tensor>1 mesh falls back
    to the GSPMD-native XLA impl. Conv activations carry no tensor-sharded
    dim and may keep shard_map under TP meshes.
    """
    mesh = active_mesh()
    if mesh is None or all(s <= 1 for s in mesh.shape.values()):
        return None, None
    if not tensor_safe and mesh.shape.get("tensor", 1) > 1:
        return mesh, None
    axes = tuple(a for a in ("data", "fsdp") if mesh.shape.get(a, 1) > 1)
    size = 1
    for a in axes:
        size *= mesh.shape[a]
    if not axes or batch % size:
        return mesh, None
    return mesh, axes


def shard_map_unchecked(fn, mesh, in_specs, out_specs):
    """jax.shard_map with replication checking off (pallas_call has no
    replication rule), across the check_vma/check_rep API rename."""
    try:
        sm = jax.shard_map
    except AttributeError:  # older jax
        from jax.experimental.shard_map import shard_map as sm
    try:
        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)
    except TypeError:
        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------

# (path regex, per-rank axis specs). First match wins. Paths are '/'-joined
# nnx.state key paths, e.g. "encoder/layers/0/TemporalAttention/qkv_projection/kernel".
# Column-parallel (output dim on 'tensor') for QKV and MLP-in; row-parallel
# (input dim on 'tensor') for out-projections and MLP-out — the standard
# Megatron split, which XLA turns into a single all-reduce per block.
_PARAM_RULES: List[Tuple[str, dict]] = [
    (r".*qkv_projection/kernel$", {2: ("fsdp", "tensor")}),
    (r".*qkv_projection/bias$", {1: ("tensor",)}),
    (r".*out_projection/kernel$", {2: ("tensor", "fsdp")}),
    (r".*linear1/kernel$", {2: ("fsdp", "tensor")}),
    (r".*linear1/bias$", {1: ("tensor",)}),
    (r".*linear2/kernel$", {2: ("tensor", "fsdp")}),
    # Patch embed / heads: shard the wide axis over fsdp only.
    (r".*(upsample|downsample|linear|spatial_compression|variance_estimator|spatial_decompression)/kernel$",
     {2: ("fsdp", None)}),
    # Conv kernels (t,kh,kw,in,out): shard output channels over fsdp.
    (r".*conv.*/kernel$|.*patch_mixer/kernel$|.*final_conv/kernel$|.*upsample/kernel$",
     {5: (None, None, None, None, "fsdp")}),
]


def _spec_for_path(path: str, shape: Sequence[int]) -> Tuple[AxisName, ...]:
    for pattern, by_rank in _PARAM_RULES:
        if re.match(pattern, path):
            axes = by_rank.get(len(shape))
            if axes is not None:
                return tuple(axes)
    # Default: FSDP-shard the largest axis (ZeRO-3 style); replicate scalars.
    if len(shape) == 0:
        return ()
    largest = int(np.argmax(shape))
    return tuple("fsdp" if i == largest else None for i in range(len(shape)))


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a parameter/optimizer-state pytree.

    Replaces the reference's manual split/device_put/merge replication dance
    (/root/reference/claude_distributed/distributed_train.py:378-382) with one
    declarative pass. With fsdp=tensor=1 every spec collapses to replication,
    which is exact reference parity.
    """

    def leaf_sharding(path, leaf):
        shape = getattr(leaf, "shape", ())
        axes = _spec_for_path(_path_str(path), shape)
        spec = _prune_spec_for_shape(mesh, shape, axes)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(tree: Any, mesh: Mesh) -> Any:
    """device_put a state pytree onto the mesh according to the param rules."""
    shardings = param_shardings(tree, mesh)
    return jax.device_put(tree, shardings)


# ---------------------------------------------------------------------------
# Batch ingest
# ---------------------------------------------------------------------------


def batch_sharding(mesh: Mesh, ndim: int, batch_axes: AxisName = ("data", "fsdp")) -> NamedSharding:
    """Batch dim sharded over data(+fsdp), everything else replicated.

    Sharding the batch over the fsdp axis too gives pure-DP semantics when
    tensor=1 while keeping the fsdp axis busy (standard HSDP layout).
    """
    return NamedSharding(mesh, P(batch_axes, *([None] * (ndim - 1))))


def shard_process_local_batch(batch: dict, mesh: Mesh) -> dict:
    """Host-local numpy batch → global jax.Array.

    Multi-host equivalent of
    /root/reference/claude_distributed/distributed_train.py:189-196. If the
    global batch doesn't divide the data axes (tiny debug runs), the batch is
    replicated instead of erroring — training still works, just without DP
    speedup for that batch.
    """
    procs = jax.process_count()
    out = {}
    for key, val in batch.items():
        ndim = np.ndim(val)
        global_batch = np.shape(val)[0] * (procs if procs > 1 else 1)
        spec = _prune_spec_for_shape(
            mesh, (global_batch,) + tuple(np.shape(val)[1:]),
            [("data", "fsdp")] + [None] * (ndim - 1),
        )
        s = NamedSharding(mesh, spec)
        if procs > 1:
            out[key] = jax.make_array_from_process_local_data(s, np.asarray(val))
        else:
            out[key] = jax.device_put(val, s)
    return out
