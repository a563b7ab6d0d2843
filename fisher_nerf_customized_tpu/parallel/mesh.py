"""Device-mesh construction.

The reference is single-GPU with no distributed backend (SURVEY.md §2.9);
scale-out is a first-class TPU-build capability instead: a `jax.sharding.
Mesh` whose axes carry (a) candidate poses / keyframes ("data") and
(b) Gaussian or tile shards ("model") over ICI.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
