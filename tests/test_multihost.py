"""Multi-host (DCN) smoke test: a REAL 2-process jax.distributed group
on CPU, exercising the non-no-op path of parallel/distributed.py —
init_distributed with an explicit coordinator, make_multihost_mesh's
host-boundary-on-data-axis layout, and one psum whose reduction crosses
the process (DCN-simulated) boundary.

The reference has nothing distributed to test (SURVEY.md §2.9/§5.8: its
scale-out is a shell for-loop); this is the TPU framework's own multi-
host contract.  Subprocess-spawned because a jax.distributed group can
only be created once per process and must not leak into the rest of the
suite.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
# the container's sitecustomize force-registers the axon TPU plugin, so
# the platform must be pinned via jax.config (tests/conftest.py recipe);
# CPU cross-process collectives need the gloo implementation
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from fisher_nerf_customized_tpu.parallel.distributed import (
    init_distributed, make_multihost_mesh, process_info)

assert init_distributed(coordinator_address=f"localhost:{port}",
                        num_processes=2, process_id=pid) is True
info = process_info()

import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_multihost_mesh(model=2)          # (data=4, model=2) over 8 dev
# host boundary rides the OUTER (data) axis: this process's 4 local
# devices occupy 2 full data rows, never splitting a model group
local_rows = {d.process_index for d in mesh.devices[:2].ravel()}
assert local_rows == {0}, f"model groups split across hosts: {local_rows}"

# one psum across the data axis: each process contributes its rank+1,
# the reduction crosses the process boundary (simulated DCN)
x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")),
    np.full((2, 8), float(pid + 1), np.float32), (4, 8))
psum_fn = jax.jit(shard_map(
    lambda v: jax.lax.psum(v, "data"),
    mesh=mesh, in_specs=P("data"), out_specs=P()))
total = np.asarray(jax.device_get(psum_fn(x)[0]))

json.dump(dict(info=info, mesh_shape=list(np.asarray(
    mesh.devices).shape), psum=float(total[0])), open(out_path, "w"))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port),
         str(tmp_path / f"out{pid}.json")],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    for pid in range(2):
        res = json.loads((tmp_path / f"out{pid}.json").read_text())
        assert res["info"]["process_count"] == 2
        assert res["info"]["global_devices"] == 8
        assert res["info"]["local_devices"] == 4
        assert res["mesh_shape"] == [4, 2]
        # psum over data=4 rows: two rows of 1.0 (proc 0) + two of 2.0
        assert res["psum"] == 6.0
