"""Multi-PROCESS distributed bring-up over the DCN path (ROADMAP #9).

The in-repo sharding tests run on a single-process 8-device CPU mesh; this
one validates the actual multi-host entry (`parallel.mesh.init_distributed`
-> `jax.distributed.initialize`): two OS processes, each contributing 2
virtual CPU devices, form one 4-device global mesh and agree on a psum and
a dp×fsdp-sharded reduction — the same code path a 2-host TPU slice uses
over DCN (reference: the 2x8 `hostfile.txt` Accelerate config, SURVEY
§2.7#29).
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
sys.path.insert(0, os.getcwd())
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
coord = sys.argv[3]

from bindyouravatar_tpu.parallel.mesh import create_mesh, init_distributed
init_distributed(coordinator=coord, num_processes=nproc, process_id=pid)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * 2, len(jax.devices())

mesh = create_mesh(dp=2, fsdp=2)
sh = NamedSharding(mesh, P(("dp", "fsdp")))

# each process supplies its LOCAL shard of a global [4, 8] batch
global_shape = (4, 8)
local = np.arange(global_shape[0] * global_shape[1], dtype=np.float32)
local = local.reshape(global_shape)[pid * 2:(pid + 1) * 2]
arrs = [jax.device_put(local[i:i + 1], d)
        for i, d in enumerate(mesh.local_devices)]
x = jax.make_array_from_single_device_arrays(global_shape, sh, arrs)

y = jax.jit(lambda a: (a * 2).sum(), out_shardings=NamedSharding(mesh, P()))(x)
want = float(np.arange(32, dtype=np.float32).sum() * 2)
got = float(y)
assert got == want, (got, want)
print(f"proc {pid}: global sum OK ({got})", flush=True)
"""


@pytest.mark.skipif(os.environ.get("BYA_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_dcn_mesh(tmp_path):
    port = 29781
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2",
             f"127.0.0.1:{port}"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "global sum OK" in out
