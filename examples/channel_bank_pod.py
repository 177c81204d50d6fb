"""Multi-channel receiver bank on a TPU mesh — the configuration the
reference cannot express: 64 NBFM channels from one wideband capture,
sharded over a (channel, time) device mesh.

Run on a pod slice (or simulate with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from luaradio_tpu.parallel.wbfm import WBFMMonoBank

devices = jax.devices()
n = len(devices)
ch = 2 if n % 2 == 0 and n >= 2 else 1
mesh = Mesh(np.asarray(devices).reshape(ch, n // ch), ("channel", "time"))

n_channels = 64
chunk = (n // ch) * 8 * 4096  # multiple of time-shards * decimation

bank = WBFMMonoBank(mesh, if_rate=256e3, decimation=8)
state = bank.init_state(n_channels)
step = bank.jit_step()

rng = np.random.default_rng(0)
for i in range(4):
    iq = (rng.standard_normal((n_channels, chunk))
          + 1j * rng.standard_normal((n_channels, chunk))
          ).astype(np.complex64)
    x = jax.device_put(jnp.asarray(iq),
                       NamedSharding(mesh, P("channel", "time")))
    state, audio = step(state, x)
    print(f"chunk {i}: audio {audio.shape} on {n} devices")
jax.block_until_ready(audio)
