"""Device mesh construction.

The reference builds a 1-D data mesh ad hoc inside each driver
(/root/reference/claude_distributed/distributed_train.py:107). Here the mesh is a
first-class object built once from :class:`MeshConfig`, with three axes:

  data   — batch (pure DP; gradients all-reduced over ICI by XLA)
  fsdp   — parameter sharding (ZeRO-3 style, via GSPMD all-gathers)
  tensor — Megatron-style tensor parallelism inside attention/MLP matmuls

Size-1 axes are free under GSPMD, so the single-chip and reference-parity
('data'-only) cases are just special shapes of the same mesh.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from video_vae_tpu.core.config import MeshConfig


def build_mesh(
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data", "fsdp", "tensor"),
) -> Mesh:
    """Build a 3-axis mesh. ``data=-1`` absorbs all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    fixed = fsdp * tensor
    if data == -1:
        if n % fixed != 0:
            raise ValueError(f"{n} devices not divisible by fsdp*tensor={fixed}")
        data = n // fixed
    if data * fsdp * tensor != n:
        raise ValueError(
            f"mesh {data}x{fsdp}x{tensor} != {n} devices"
        )
    dev_array = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(dev_array, tuple(axis_names))


def mesh_from_config(cfg: MeshConfig, devices=None) -> Mesh:
    return build_mesh(
        cfg.data, cfg.fsdp, cfg.tensor, devices=devices, axis_names=cfg.axis_names
    )


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-process batch for multi-host ingest."""
    procs = jax.process_count()
    if global_batch % procs != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {procs} processes")
    return global_batch // procs


def largest_divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap (used to fit shardings to odd dims)."""
    best = 1
    for d in range(1, int(math.isqrt(n)) + 1):
        if n % d == 0:
            for c in (d, n // d):
                if c <= cap:
                    best = max(best, c)
    return best
