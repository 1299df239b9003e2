"""Tracing, step timing, metrics logging (first-class, unlike the reference).

SURVEY §5.1/§5.5: the reference has only ad-hoc wall-clock prints and a
TensorBoard logger in the spatial stage. Here:

  * `trace(...)` — context manager around `jax.profiler` (XLA/TPU traces
    viewable in TensorBoard/XProf);
  * `StepTimer` — async-aware per-step timing with p50/p95 summaries;
  * `MetricsLogger` — JSONL metrics stream (+ optional TensorBoard when
    available), replacing `self.log("train/loss_*")`.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.effects_barrier()
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer that blocks on async dispatch at each mark."""

    def __init__(self, name: str = "step"):
        self.name = name
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        else:
            jax.effects_barrier()
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            f"{self.name}_mean_ms": float(t.mean() * 1e3),
            f"{self.name}_p50_ms": float(np.percentile(t, 50) * 1e3),
            f"{self.name}_p95_ms": float(np.percentile(t, 95) * 1e3),
            f"{self.name}_steps": len(self.times),
        }


class MetricsLogger:
    """JSONL metrics writer (+ optional TensorBoard)."""

    def __init__(self, out_dir: str, use_tensorboard: bool = False):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(out_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            if isinstance(v, (str, bool)) or v is None:
                rec[k] = v
            elif np.isscalar(v) or hasattr(v, "item"):
                rec[k] = float(v)
            else:
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
