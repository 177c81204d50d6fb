"""Spike: does jax.distributed over N localhost CPU processes work here?

Each process gets 2 virtual CPU devices; a ("time",) mesh spans all
processes; shard_map runs a psum + ppermute; each process supplies its
local slice via make_array_from_process_local_data.
"""
import os, sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags +
                               " --xla_force_host_platform_device_count=2").strip()
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
print(f"[{pid}] process_count={jax.process_count()} ndev={len(devs)}",
      flush=True)
mesh = Mesh(np.array(devs), ("time",))
D = len(devs)
T = 8 * D
sh = NamedSharding(mesh, P("time"))

x_global = np.arange(T, dtype=np.float32)
nlocal = T // nproc
lo = pid * nlocal
x_local = x_global[lo:lo + nlocal]
arr = jax.make_array_from_process_local_data(sh, x_local)

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map


def step(x):
    t = lax.psum(jnp.sum(x), "time")
    halo = lax.ppermute(x[-1:], "time",
                        [(i, (i + 1) % D) for i in range(D)])
    return x + t, halo


f = jax.jit(shard_map(step, mesh=mesh, in_specs=P("time"),
                      out_specs=(P("time"), P("time"))))
y, h = f(arr)
local_y = np.concatenate([np.asarray(s.data) for s in y.addressable_shards])
expect = x_local + x_global.sum()
assert np.array_equal(local_y, expect), (local_y, expect)
print(f"[{pid}] MH-SPIKE OK", flush=True)
