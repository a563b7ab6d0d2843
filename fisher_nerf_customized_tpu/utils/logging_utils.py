"""Metrics/observability channels.

Reference (SURVEY.md §5.5): tensorboardX SummaryWriter + wandb + rich
console.  Offline-first equivalents: a JSONL metrics stream (always on),
optional tensorboardX / wandb when importable, and a step timer channel
that doubles as the profiling hook (the reference has only commented-out
time.time() deltas; SURVEY.md §5.1).
"""
from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict
from contextlib import contextmanager

logger = logging.getLogger("fnc_tpu")


class MetricsLogger:
    def __init__(self, log_dir: str, run_name: str = "run",
                 use_wandb: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}_metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter   # optional
            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project="active_mapping",
                                         name=run_name)
            except Exception:
                logger.warning("wandb requested but unavailable")

    def log(self, step: int, **metrics):
        rec = dict(step=int(step), t=time.time(), **{
            k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Per-phase wall-clock accounting (tracking/mapping/planning/eval);
    the first-class profiling channel the reference lacks."""

    MAX_EVENTS = 20000

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        # bounded per-call timeline [(name, t_start, dt)] — lets a
        # post-run analysis separate warm event cost from compile/stall
        # outliers, which per-phase means hide
        self.events: list[tuple[str, float, float]] = []

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            if len(self.events) < self.MAX_EVENTS:
                self.events.append((name, t0, dt))

    def summary(self) -> dict:
        return {k: dict(total_s=round(self.totals[k], 3),
                        count=self.counts[k],
                        mean_ms=round(self.totals[k] / max(self.counts[k], 1)
                                      * 1000, 2))
                for k in self.totals}


@contextmanager
def jax_profile_trace(log_dir: str | None):
    """jax.profiler trace wrapper (drop-in observability; view with
    tensorboard or xprof)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
