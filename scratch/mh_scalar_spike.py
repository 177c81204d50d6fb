"""Spike: replicate() of a 0-d scalar over a 2-process mesh."""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid, nproc, port):
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    sys.path.insert(0, REPO)
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from luaradio_tpu.parallel import multihost
    multihost.initialize(f"localhost:{port}", nproc, pid)
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()), ("time",))
    s = multihost.replicate(mesh, np.asarray(7, np.int32))
    print(pid, "replicated scalar:", s.shape, s.dtype, flush=True)
    buf = multihost.replicate(mesh, np.arange(64, dtype=np.float32))
    import jax.numpy as jnp
    from jax import lax

    def f(b, st):
        return lax.dynamic_slice(b, (st,), (8,))

    out = jax.jit(f)(buf, s)
    print(pid, "slice ok:", np.asarray(
        out.addressable_shards[0].data)[:3], flush=True)

    # now through shard_map like the runtime does
    import inspect
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def g(b, st):
        print(pid, "traced shapes:", b.shape, st.shape, flush=True)
        idx = lax.axis_index("time")
        return lax.dynamic_slice(b, (st + idx * 8,), (8,))

    kw = {}
    params = inspect.signature(shard_map).parameters
    if "check_rep" in params:
        kw["check_rep"] = False
    elif "check_vma" in params:
        kw["check_vma"] = False
    sm = shard_map(g, mesh=mesh, in_specs=(P(), P()),
                   out_specs=P("time"), **kw)
    out2 = jax.jit(sm)(buf, s)
    print(pid, "shard_map slice ok:",
          np.asarray(out2.addressable_shards[0].data)[:3], flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
    else:
        s = socket.socket(); s.bind(("localhost", 0))
        port = s.getsockname()[1]; s.close()
        ps = [subprocess.Popen([sys.executable, __file__, str(p), "2",
                                str(port)],
                               stdout=subprocess.PIPE,
                               stderr=subprocess.STDOUT) for p in range(2)]
        for p in ps:
            out, _ = p.communicate(timeout=120)
            print("rc", p.returncode)
            print(out.decode()[-1500:])
