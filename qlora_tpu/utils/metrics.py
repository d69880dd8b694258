"""Experiment tracking + profiling hooks.

Reference equivalents (SURVEY.md N16 / §5): trainer.log_metrics →
``MetricsLogger`` (jsonl always; wandb when ``report_to='wandb'`` and the
package exists, matching the reference's opt-in default 'none',
qlora.py:193-196); plus `jax.profiler` trace capture around training steps
— the tracing affordance the reference lacks entirely.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Optional

logger = logging.getLogger(__name__)


class MetricsLogger:
    def __init__(self, output_dir: str, report_to: str = "none", run_name=None):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "train_log.jsonl")
        self._f = open(self.path, "a")
        self._wandb = None
        if report_to == "wandb":
            try:
                import wandb

                self._wandb = wandb.init(
                    project="qlora_tpu", name=run_name, dir=output_dir
                )
            except Exception as e:  # wandb optional, offline-safe
                logger.warning("wandb unavailable (%s); jsonl only", e)

    def log(self, metrics: dict, step: Optional[int] = None):
        row = {"ts": time.time(), **({"step": step} if step is not None else {}),
               **metrics}
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


@contextlib.contextmanager
def maybe_profile(output_dir: str, enabled: bool):
    """jax.profiler trace around a step window; view with TensorBoard/xprof."""
    if not enabled:
        yield
        return
    import jax

    trace_dir = os.path.join(output_dir, "profile")
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profile trace written to %s", trace_dir)


class StepTimer:
    """Per-step wall timing with warmup-aware averages."""

    def __init__(self, skip_first: int = 2):
        self.skip = skip_first
        self.times: list[float] = []
        self._t0 = None
        self._n = 0

    def tick(self):
        self._t0 = time.perf_counter()

    def tock(self) -> float:
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.skip:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0
