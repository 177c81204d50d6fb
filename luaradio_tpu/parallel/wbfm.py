"""Flagship multi-chip pipeline: WBFM mono receiver bank sharded over a
(channel, time) mesh.

This is the BASELINE.json north-star configuration: C independent FM
channels from a wideband capture, each demodulated by the
discriminator -> AF lowpass -> deemphasis -> decimator chain
(composites/fm.py WBFMMonoDemodulator), with

* the channel axis sharded over the ``channel`` mesh axis (no collectives),
* the time axis sharded over the ``time`` mesh axis using the halo-exchange
  and distributed-prefix kernels of luaradio_tpu.parallel.time (ppermute +
  all_gather ride ICI).

The whole step is one jitted shard_map program; carried state (FIR tails,
discriminator sample, deemphasis IIR state) is threaded explicitly so
chunked streaming matches the single-chip reference output bit-for-bit
within float tolerance.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from luaradio_tpu.blocks.signal.filtering import _singlepole_lowpass_coeffs
from luaradio_tpu.parallel.time import (discriminator_sharded, fir_sharded,
                                        left_halo, linrec_first_order_sharded)
from luaradio_tpu.utils import filter_design


class WBFMMonoBank:
    """C-channel WBFM mono demodulator over a (channel, time) mesh.

    step(state, x[C, T]) -> (state, audio[C, T // decimation])
    """

    def __init__(self, mesh: Mesh, if_rate: float = 256e3,
                 decimation: int = 8, tau: float = 75e-6,
                 num_taps: int = 128):
        self.mesh = mesh
        self.if_rate = if_rate
        self.decimation = decimation
        self.num_taps = num_taps
        nyq = if_rate / 2.0
        self.taps = jnp.asarray(filter_design.firwin_lowpass(
            num_taps, 15e3 / nyq).astype(np.float32))
        b, a = _singlepole_lowpass_coeffs(1.0 / (2 * np.pi * tau), if_rate)
        # 1-pole deemphasis y[n] = -a1*y[n-1] + b0*x[n] + b1*x[n-1]
        self._b = b.astype(np.float32)
        self._a1 = np.float32(a[1])
        self.gain = 1.25  # discriminator modulation index (wbfm chain)

        self.x_spec = P("channel", "time")
        self.state_spec = (P("channel"), P("channel"), P("channel"),
                           P("channel"))

        # check_vma=False: the carried state is made replicated over the
        # time axis by the trailing all_gather, which the static checker
        # cannot infer.
        @partial(shard_map, mesh=mesh,
                 in_specs=(self.state_spec, self.x_spec),
                 out_specs=(self.state_spec, self.x_spec),
                 check_vma=False)
        def step(state, x):
            disc_prev, fir_tail, deemph_y, f_last = state
            axis = "time"
            # 1. discriminator with 1-sample halo; shard 0 uses carried state
            prev = jnp.concatenate(
                [jnp.where(lax.axis_index(axis) == 0, disc_prev[..., None],
                           left_halo(x, 1, axis)), x[..., :-1]], axis=-1)
            t = x * jnp.conj(prev)
            m = jnp.arctan2(t.imag, t.real) * np.float32(
                1.0 / (2 * np.pi * self.gain))
            # 2. AF lowpass FIR with M-1 halo
            f = fir_sharded(m, self.taps, axis, tail=fir_tail)
            # 3. FM deemphasis: 1-pole IIR as distributed linear recurrence
            b0, b1 = np.float32(self._b[0]), np.float32(self._b[1])
            f_prev = jnp.concatenate(
                [jnp.where(lax.axis_index(axis) == 0, f_last[..., None],
                           left_halo(f, 1, axis)), f[..., :-1]], axis=-1)
            u = b0 * f + b1 * f_prev
            y = linrec_first_order_sharded(u, -self._a1, deemph_y, axis)
            # 4. decimate (shard length is a multiple of decimation)
            audio = y[..., ::self.decimation]

            # carried state for the next chunk comes from the LAST shard;
            # broadcast it so every shard's state slot holds the right value
            def from_last(v):
                allv = lax.all_gather(v, axis)
                return allv[-1]
            new_state = (from_last(x[..., -1]),
                         from_last(m[..., -(self.num_taps - 1):]),
                         from_last(y[..., -1]),
                         from_last(f[..., -1]))
            return new_state, audio

        self._step = step

    def init_state(self, n_channels: int):
        shard = NamedSharding(self.mesh, P("channel"))
        c = n_channels
        state = (jnp.zeros((c,), jnp.complex64),
                 jnp.zeros((c, self.num_taps - 1), jnp.float32),
                 jnp.zeros((c,), jnp.float32),
                 jnp.zeros((c,), jnp.float32))
        return jax.device_put(state, shard)

    def jit_step(self):
        return jax.jit(self._step, donate_argnums=(0,))


__all__ = ["WBFMMonoBank"]
