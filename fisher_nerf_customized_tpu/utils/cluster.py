"""Cluster preemption handling (SLURM) + graceful checkpoint-and-requeue.

Reference: cluster_manager.py:7-65 ClusterStateManager — SIGTERM/SIGINT/
SIGUSR1 handlers set exit flags that the hot loops poll (tester:804-805,
gaussian.py:588-589); `requeue()` calls `scontrol requeue $SLURM_JOB_ID`
and exits.  Same contract here; requeue is a no-op outside SLURM.
"""
from __future__ import annotations

import os
import signal
import subprocess
import sys
import time


class ClusterStateManager:
    def __init__(self, time_to_run: float | None = None):
        self._exit_requested = False
        self._start = time.time()
        self.time_to_run = time_to_run
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, self._handler)
            except (ValueError, OSError):   # non-main thread
                pass

    def _handler(self, signum, frame):
        self._exit_requested = True

    def should_exit(self) -> bool:
        if self._exit_requested:
            return True
        if self.time_to_run is not None and \
                time.time() - self._start > self.time_to_run:
            return True
        return False

    def requeue(self, exit_code: int = 0):
        job_id = os.environ.get("SLURM_JOB_ID")
        if job_id:
            subprocess.call(["scontrol", "requeue", job_id])
        sys.exit(exit_code)


_GLOBAL_CM: ClusterStateManager | None = None


def get_cluster_manager() -> ClusterStateManager:
    global _GLOBAL_CM
    if _GLOBAL_CM is None:
        _GLOBAL_CM = ClusterStateManager()
    return _GLOBAL_CM
