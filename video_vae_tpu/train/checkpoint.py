"""Orbax checkpointing with SIGTERM-safe shutdown.

Parity: save_checkpoint/load_checkpoint (/root/reference/train/rl_nonadversarial.py:62-67,
/root/reference/train/model_loader.py:35-42) — the on-disk tree keeps the exact
``{"model": ..., "optimizer": ...}`` nnx.state structure so checkpoints remain
structurally cross-loadable with the reference. The multi-host path relies on
Orbax's native distributed save/restore instead of the reference's
numpy-materialize + proc-0-restore + broadcast workaround
(/root/reference/claude_distributed/distributed_train.py:314-341).

SIGTERM/SIGINT handling (spot-instance robustness) mirrors
distributed_train.py:58-67: a flag flips on signal, the training loop saves a
final checkpoint and exits cleanly.
"""

from __future__ import annotations

import os
import signal
from typing import Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp
from flax import nnx


def _abstract(tree):
    return jax.tree.map(ocp.utils.to_shape_dtype_struct, tree)


def save_checkpoint(model: nnx.Module, optimizer, path: str) -> None:
    """One-shot synchronous save of {"model","optimizer"}."""
    state = {"model": nnx.state(model), "optimizer": nnx.state(optimizer)}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state)
    ckptr.wait_until_finished()


def load_checkpoint(model: nnx.Module, optimizer, path: str) -> None:
    """In-place restore into an already-constructed model/optimizer."""
    abstract = {
        "model": _abstract(nnx.state(model)),
        "optimizer": _abstract(nnx.state(optimizer)),
    }
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path), abstract)
    nnx.update(model, restored["model"])
    nnx.update(optimizer, restored["optimizer"])


def import_reference_state(model: nnx.Module, ref_model_state) -> int:
    """Load a reference-repo VideoVAE state tree into our VideoVAE, in place.

    The migration path for users of floatingtrees/video-VAE: module names were
    kept aligned by design (encoder/decoder/fill_token; PatchEmbedding
    linear+norm; FactoredAttention Spatial/Temporal Attention+MLP with
    qkv_projection/out_projection/input_norm/q_norm/k_norm; UNet patch_mixer/
    encoders/bottleneck1,2/decoders/final_conv — see
    /root/reference/train/rl_model.py:15-147, layers.py:8-224, unet.py:7-188),
    so the mapping is 1:1 by path. The only reference entries without a
    counterpart are the RotaryEmbedding cos/sin caches (layers.py:103-104) —
    our RoPE is stateless (ops/rope.py) and recomputes them at trace time.

    ``ref_model_state``: the ``{"model": ...}`` subtree of a reference
    checkpoint (nnx.State or nested dict of arrays). Returns the number of
    parameters copied.
    """
    import numpy as np

    def _flatten(tree, prefix=()):
        # nnx.State, dict, and list/tuple nesting all appear in reference trees
        if hasattr(tree, "items"):
            for key, value in tree.items():
                yield from _flatten(value, prefix + (str(key),))
        elif isinstance(tree, (list, tuple)):
            for i, value in enumerate(tree):
                yield from _flatten(value, prefix + (str(i),))
        else:
            value = getattr(tree, "value", tree)
            if value is None:
                return
            yield prefix, value

    ref_flat = {
        path: np.asarray(value)
        for path, value in _flatten(ref_model_state)
        if "ROPE" not in path
    }

    state = nnx.state(model)
    ours_flat = {
        tuple(str(p) for p in path): var for path, var in state.flat_state()
    }
    copied = 0
    missing = []
    touched = set()
    for path, value in ref_flat.items():
        if path not in ours_flat:
            missing.append(path)
            continue
        var = ours_flat[path]
        if tuple(var.value.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"ours {tuple(var.value.shape)} vs reference {tuple(value.shape)}"
            )
        var.value = jnp.asarray(value, var.value.dtype)
        touched.add(path)
        copied += 1
    if missing:
        raise KeyError(f"reference params with no counterpart: {missing[:5]}")
    # Our params the copy loop never wrote would silently keep their random
    # init — a migration user must hear about that. RNG state is legitimately
    # ours-only; everything else is an error.
    untouched = [
        p for p, var in ours_flat.items()
        if p not in touched
        and getattr(var, "value", None) is not None
        and not any("rng" in seg.lower() for seg in p)
    ]
    if untouched:
        raise ValueError(
            f"{len(untouched)} of our params were not present in the reference "
            f"checkpoint (would keep random init): {untouched[:5]}"
        )
    nnx.update(model, state)
    return copied


class CheckpointManager:
    """Step-indexed async checkpointing (replaces ad-hoc per-epoch paths)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, model: nnx.Module, optimizer) -> None:
        state = {"model": nnx.state(model), "optimizer": nnx.state(optimizer)}
        self._mngr.save(step, args=ocp.args.StandardSave(state))

    def step_dir(self, step: int) -> str:
        return str(self._mngr.directory / str(step))

    def restore_latest(self, model: nnx.Module, optimizer) -> Optional[int]:
        step = self._mngr.latest_step()
        if step is None:
            return None
        abstract = {
            "model": _abstract(nnx.state(model)),
            "optimizer": _abstract(nnx.state(optimizer)),
        }
        restored = self._mngr.restore(step, args=ocp.args.StandardRestore(abstract))
        nnx.update(model, restored["model"])
        nnx.update(optimizer, restored["optimizer"])
        return step

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()


class GracefulShutdown:
    """SIGTERM/SIGINT → flag; the training loop checkpoints and exits."""

    def __init__(self, install: bool = True):
        self.should_stop = False
        self._prev = {}
        if install:
            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    self._prev[sig] = signal.signal(sig, self._handler)
                except ValueError:  # non-main thread (tests)
                    pass

    def _handler(self, signum, frame):
        print(f"[checkpoint] received signal {signum}; will checkpoint and stop")
        self.should_stop = True

    def uninstall(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
