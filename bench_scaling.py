"""Scaling-efficiency benchmark: WBFM receiver-bank throughput vs mesh size.

Measures complex samples/s of the (channel, time)-sharded WBFMMonoBank at
1, 2, 4, ... devices and reports parallel efficiency — the BASELINE.json
secondary metric (>80% target).  On a single-chip or CPU host this runs on
virtual devices (XLA_FLAGS=--xla_force_host_platform_device_count=N), which
measures collective/overhead structure rather than real ICI bandwidth; on a
pod slice it measures the real thing.

Prints one JSON line per mesh size.
"""

import json
import time

import numpy as np


def run(max_devices: int | None = None):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from luaradio_tpu.parallel.wbfm import WBFMMonoBank

    devices = jax.devices()
    nd = len(devices) if max_devices is None else min(len(devices),
                                                      max_devices)
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= nd]
    base_rate = None
    for n in sizes:
        ch = 2 if n % 2 == 0 and n >= 2 else 1
        mesh = Mesh(np.asarray(devices[:n]).reshape(ch, n // ch),
                    ("channel", "time"))
        C = 8
        T = (n // ch) * 8 * (1 << 14)
        bank = WBFMMonoBank(mesh, if_rate=256e3, decimation=8)
        state = bank.init_state(C)
        step = bank.jit_step()
        rng = np.random.default_rng(0)
        x = jax.device_put(
            jnp.asarray((rng.standard_normal((C, T))
                         + 1j * rng.standard_normal((C, T))
                         ).astype(np.complex64)),
            NamedSharding(mesh, P("channel", "time")))
        state, audio = step(state, x)
        np.asarray(audio[..., -1])  # force
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state, audio = step(state, x)
            np.asarray(audio[..., -1])
            best = min(best, time.perf_counter() - t0)
        sps = C * T / best
        if base_rate is None:
            base_rate = sps / n if n == 1 else sps / n
        eff = sps / (base_rate * n)
        print(json.dumps({"devices": n, "samples_per_sec": sps,
                          "efficiency": eff}))


if __name__ == "__main__":
    run()
