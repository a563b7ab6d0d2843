"""Multi-host wiring: jax.distributed + DCN/ICI mesh layout.

The reference's multi-scene scale-out is a shell for-loop over scenes on
one GPU each (reference scripts/mp3d.sh:31-43 + scripts/run_process.py
CUDA_VISIBLE_DEVICES pinning); its only cluster awareness is SLURM
requeue (reference cluster_manager.py).  The TPU-native equivalent is a
jax.distributed process group: one process per host, all chips in one
global mesh, with the scene/episode ("data") axis laid out ACROSS hosts
so scene-parallel work rides DCN while the inner ("model") axis stays
within a host's ICI domain (SURVEY.md §2.9 equivalent (2), §5.8).
"""
from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh

_INITIALIZED = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> bool:
    """Initialize the jax.distributed process group for multi-host runs.

    Resolution order: explicit args -> JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env -> SLURM auto-detection
    (jax.distributed.initialize() reads SLURM_* itself).  Single-host
    invocations are a no-op returning False, so the CLI can call this
    unconditionally.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = int(num_processes if num_processes is not None
            else os.environ.get("JAX_NUM_PROCESSES", 0) or 0)
    if coord is None:
        if os.environ.get("SLURM_STEP_NODELIST") and \
                int(os.environ.get("SLURM_STEP_NUM_TASKS", 1)) > 1:
            jax.distributed.initialize()     # SLURM auto-detect
            _INITIALIZED = True
            return True
        return False
    if n <= 1:
        return False
    pid = int(process_id if process_id is not None
              else os.environ.get("JAX_PROCESS_ID", 0))
    jax.distributed.initialize(coordinator_address=coord, num_processes=n,
                               process_id=pid,
                               local_device_ids=local_device_ids)
    _INITIALIZED = True
    return True


def make_multihost_mesh(model: int = 1, devices=None) -> Mesh:
    """Global ("data", "model") mesh with DCN-aware layout.

    jax.devices() enumerates devices grouped by process (host), so
    reshaping to (hosts * local//model, model) puts the host boundary on
    the OUTER "data" axis: scene/candidate parallelism crosses DCN (cheap
    — independent work, collectives are small score gathers), while
    "model" (Gaussian-axis) collectives — the psum_scatter/all_gather of
    the sharded renderer — stay inside a host's ICI domain.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_local = jax.local_device_count() if devices is None else n // max(
        jax.process_count(), 1)
    if model > 1:
        assert n_local % model == 0 or n % model == 0, \
            f"model={model} must divide the per-host device count"
    assert n % model == 0, f"model={model} must divide {n} devices"
    arr = np.asarray(devices).reshape(n // model, model)
    return Mesh(arr, axis_names=("data", "model"))


def process_info() -> dict:
    return dict(process_index=jax.process_index(),
                process_count=jax.process_count(),
                local_devices=jax.local_device_count(),
                global_devices=jax.device_count())
