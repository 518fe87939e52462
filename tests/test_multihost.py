"""Multi-host pod plumbing smoke: TWO real processes wired through
jax.distributed (the JAX analogue of the reference's one-process-per-GPU
NCCL bootstrap, train.py:374-379) assemble a global batch with
put_global_batch and run a sharded computation + a collective.

This exercises the actual cross-process code path — process_index-strided
data, make_array_from_process_local_data, global-mesh jit — not just the
virtual-device simulation the rest of the suite uses."""
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

# each process must see ONLY its own CPU devices
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax
proc_id = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:%PORT%",
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2
assert jax.process_index() == proc_id

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from semireward_tpu.parallel.mesh import build_mesh, put_global_batch

mesh = build_mesh((-1,), ("data",))          # 4 global devices (2 x 2)
sh = NamedSharding(mesh, P("data"))

# rank-strided local rows like data/loader.py: global batch = arange(8)
world, rank = jax.process_count(), jax.process_index()
local = np.arange(8, dtype=np.float32).reshape(8, 1)[rank::world]
batch = put_global_batch(sh, {"x": local})
x = batch["x"]
assert x.shape == (8, 1), x.shape

def f(x):
    return jnp.sum(x * 2.0)

total = jax.jit(f)(x)
# strided reassembly must see every global row exactly once: 2*sum(0..7)=56
assert float(total) == 56.0, float(total)

# --- rank-0-only checkpoint I/O under the global mesh (VERDICT r2 #8) ---
# trainer.py gates save_checkpoint on rank 0 (core/trainer.py:453-458);
# reproduce that exact pattern on a REPLICATED state pytree living on the
# 4-device global mesh (replicated arrays are fully addressable on every
# process, so the numpy-ify inside save_checkpoint must work from rank 0).
from semireward_tpu.core.checkpoint import save_checkpoint

rep = NamedSharding(mesh, P())
state = {"params": jax.device_put(jnp.arange(6.0).reshape(2, 3), rep),
         "step": jax.device_put(jnp.int32(7), rep)}
path = r"%CKPT%"
if rank == 0:
    save_checkpoint(path, state, extra={"it": 7})
# barrier so rank 1 only reads after rank 0's atomic rename: a collective
# both processes must enter
jax.block_until_ready(jax.jit(f)(x))
import time
for _ in range(100):
    if os.path.exists(path):
        break
    time.sleep(0.1)
with open(path, "rb") as fh:
    import pickle
    payload = pickle.load(fh)
np.testing.assert_array_equal(payload["state"]["params"],
                              np.arange(6.0).reshape(2, 3))
assert payload["extra"]["it"] == 7
print(f"proc {proc_id} OK total={float(total)}")
"""


@pytest.mark.skipif(sys.platform != "linux", reason="linux only")
def test_two_process_distributed_smoke(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("%PORT%", str(port))
                      .replace("%CKPT%", str(tmp_path / "latest.ckpt")))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, cwd=repo)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
