"""Metric logging: stdout + JSONL file + optional wandb.

The reference logs to wandb when available and prints otherwise
(/root/reference/train/rl_nonadversarial.py:344-361). Here the JSONL file is the
always-on structured record (greppable, survives without network), wandb is an
optional sink, and only process 0 emits.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np


class MetricLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        run_name: str = "train",
        use_wandb: bool = False,
        wandb_project: str = "video-vae-tpu",
        config: Optional[dict] = None,
    ):
        self.is_main = jax.process_index() == 0
        self._file = None
        self._wandb = None
        self._start = time.perf_counter()
        if not self.is_main:
            return
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, f"{run_name}.jsonl"), "a")
        if use_wandb:
            try:
                import wandb

                wandb.init(project=wandb_project, config=config or {})
                self._wandb = wandb
            except ImportError:
                print("[metrics] wandb requested but not installed; using JSONL only")

    def log(self, metrics: Dict, step: int, prefix: str = "", echo: bool = True) -> None:
        if not self.is_main:
            return
        flat = {}
        for key, value in metrics.items():
            if hasattr(value, "ndim") and getattr(value, "ndim", 1) > 0:
                continue  # skip tensors (e.g. reconstructions)
            flat[f"{prefix}{key}"] = float(np.asarray(value))
        flat["step"] = step
        flat["elapsed"] = round(time.perf_counter() - self._start, 3)
        if self._file:
            self._file.write(json.dumps(flat) + "\n")
            self._file.flush()
        if self._wandb:
            self._wandb.log(flat, step=step)
        if echo:
            body = ", ".join(
                f"{key}={val:.5g}" for key, val in flat.items() if key not in ("step",)
            )
            print(f"[{prefix or 'train'} step {step}] {body}", flush=True)

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._wandb:
            self._wandb.finish()
