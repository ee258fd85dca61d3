"""Multi-process (DCN-path) bring-up test: two CPU processes join via
jax.distributed, build the pod mesh (segment axis across processes, tile
axis within a process), and run collectives over both axes.

This exercises the explicit-coordinator branch of
parallel.mesh.init_distributed that single-process tests can't reach
(SURVEY.md §2.3 / §7.5: jax.distributed over ICI/DCN)."""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["HT3DGS_REPO"])
pid = int(sys.argv[1])
port = sys.argv[2]

from ht3dgs.parallel import mesh as mesh_lib

n = mesh_lib.init_distributed(coordinator=f"localhost:{port}",
                              num_processes=2, process_id=pid)
assert n == 4, f"global devices {n} != 4"
assert jax.local_device_count() == 2
assert jax.process_count() == 2

# default pod mesh: tile = the process's local devices, segment = processes
mesh = mesh_lib.make_pod_mesh()
assert mesh.shape == {"segment": 2, "tile": 2}, dict(mesh.shape)
# every tile group must stay inside one process (per-step collectives on
# "ICI"); the segment axis crosses processes ("DCN")
import numpy as np
dev = np.asarray(mesh.devices)
for s in range(2):
    assert len({d.process_index for d in dev[s]}) == 1, "tile spans procs"
assert {d.process_index for d in dev[:, 0]} == {0, 1}

# collective over both axes: psum of per-device contributions
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("segment", "tile")),
    np.full((1, 2), float(pid + 1), np.float32), (2, 2))

def f(blk):
    return jax.lax.psum(jnp.sum(blk), ("segment", "tile"))

y = jax.jit(shard_map(f, mesh=mesh, in_specs=P("segment", "tile"),
                      out_specs=P(), check_vma=False))(x)
total = float(np.asarray(y.addressable_shards[0].data))
assert total == 2.0 * 1 + 2.0 * 2, total   # 2 devices x val per process

# segment-axis independence: per-segment sums differ, no cross-talk
def g(blk):
    return jax.lax.psum(jnp.sum(blk), "tile")[None]

z = jax.jit(shard_map(g, mesh=mesh, in_specs=P("segment", "tile"),
                      out_specs=P("segment"), check_vma=False))(x)
local = float(np.asarray(z.addressable_shards[0].data))
assert local == 2.0 * (pid + 1), local
print(f"proc {pid} OK", flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="gloo/linux only")
def test_two_process_distributed_bringup(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["HT3DGS_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    # a fresh env per subprocess: drop the parent's 8-device forcing
    env.pop("XLA_FLAGS", None)
    port = "29681"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out = p.communicate()[0]
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
