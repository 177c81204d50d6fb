"""Scaling benchmark: WBFM receiver-bank throughput vs mesh size.

Two modes of reading the numbers:

* On a REAL pod slice, `efficiency` is the BASELINE.json secondary metric
  (weak-scaling parallel efficiency, >80% target): T scales with the mesh
  and every device is real silicon on real ICI.

* On a single host with VIRTUAL devices
  (XLA_FLAGS=--xla_force_host_platform_device_count=N) the devices all
  share the same cores, so `efficiency` is bounded by ncores/n and says
  nothing about ICI.  What IS measurable there is the STRUCTURAL cost of
  sharding: `overhead_vs_single` runs the SAME total work unsharded and
  sharded and reports the added fraction (halo ppermutes, all_gather
  prefix combines, partition bookkeeping).  tests/parallel asserts this
  overhead stays small — that is the honest single-host scaling gate.

Prints one JSON line per mesh size plus a trailing summary line.
"""

import json
import os
import time

import numpy as np


def _bench(step, state, x, fence, trials=3):
    state, out = step(state, x)
    fence(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        state, out = step(state, x)
        fence(out)
        best = min(best, time.perf_counter() - t0)
    return best


def run(max_devices: int | None = None, emit=print,
        total_t: int | None = None):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from luaradio_tpu.parallel.wbfm import WBFMMonoBank

    devices = jax.devices()
    nd = len(devices) if max_devices is None else min(len(devices),
                                                      max_devices)
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= nd]
    C = 8
    T = total_t or 8 * (1 << 14) * 8  # FIXED total work across mesh sizes

    rng = np.random.default_rng(0)
    x_host = (rng.standard_normal((C, T))
              + 1j * rng.standard_normal((C, T))).astype(np.complex64)

    results = []
    base_time = None
    for n in sizes:
        ch = 2 if n % 2 == 0 and n >= 2 else 1
        mesh = Mesh(np.asarray(devices[:n]).reshape(ch, n // ch),
                    ("channel", "time"))
        bank = WBFMMonoBank(mesh, if_rate=256e3, decimation=8)
        state = bank.init_state(C)
        step = bank.jit_step()
        x = jax.device_put(jnp.asarray(x_host),
                           NamedSharding(mesh, P("channel", "time")))
        best = _bench(step, state, x,
                      lambda out: np.asarray(out[..., -1]))
        if base_time is None:
            base_time = best
        sps = C * T / best
        rec = {"devices": n, "mesh": [ch, n // ch],
               "samples_per_sec": sps,
               "efficiency": (base_time / best) / n,
               "overhead_vs_single": best / base_time - 1.0}
        results.append(rec)
        emit(json.dumps(rec))

    summary = {
        "host_cores": os.cpu_count(),
        "n_real_devices": len(jax.devices()),
        "platform": devices[0].platform,
        "virtual_mesh": devices[0].platform == "cpu",
        "note": ("virtual-device meshes share host cores: 'efficiency' is "
                 "bounded by ncores/n there; 'overhead_vs_single' (same "
                 "work, sharded vs not) is the structural metric"),
        "max_overhead_vs_single": max(r["overhead_vs_single"]
                                      for r in results),
        "results": results,
    }
    emit(json.dumps(summary))
    return summary


if __name__ == "__main__":
    import sys
    out = None
    if len(sys.argv) > 2 and sys.argv[1] == "--out":
        out = sys.argv[2]
    summary = run()
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
