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


class WBFMStereoBank:
    """C-channel WBFM STEREO demodulator over a (channel, time) mesh.

    step(state, x[C, T]) -> (state, (left[C, T//D], right[C, T//D]))

    The pilot path uses the vectorized recovery (bandpass FIR + magnitude
    normalization + phase doubling, parallel/time.py
    pilot_recovery_sharded) instead of the reference's sequential PLL
    (pll.lua:138-167) — the PLL is a per-sample feedback loop and cannot
    time-shard; the vectorized path is FIR + elementwise, so the whole
    stereo chain (SURVEY §7's hard part) shards over the time axis with
    ppermute halo exchange.  Validated against the single-device
    block-graph demodulator in tests/parallel/test_stereo_bank.py.

    Reference topology: wbfmstereodemodulator.lua:28-64 (discriminator ->
    Hilbert -> {pilot bandpass -> carrier x2, delay} -> coherent mixer ->
    L+R / L-R filters -> stereo matrix -> deemphasis)."""

    def __init__(self, mesh: Mesh, if_rate: float = 256e3,
                 decimation: int = 8, tau: float = 75e-6):
        self.mesh = mesh
        self.if_rate = if_rate
        self.decimation = decimation
        nyq = if_rate / 2.0
        ht_taps = filter_design.fir_hilbert_transform(129).astype(np.float32)
        bp = filter_design.firwin_complex_bandpass(
            129, (18e3 / nyq, 20e3 / nyq)).astype(np.complex64)
        af = filter_design.firwin_lowpass(128, 15e3 / nyq).astype(np.float32)
        self.ht_taps = jnp.asarray(ht_taps)
        self.af_taps = jnp.asarray(af)
        self._bp = bp
        b, a = _singlepole_lowpass_coeffs(1.0 / (2 * np.pi * tau), if_rate)
        self._b = b.astype(np.float32)
        self._a1 = np.float32(a[1])
        self.gain = 1.25
        self.group_delay = 64  # (129-1)/2: pilot/Hilbert path group delay

        self.x_spec = P("channel", "time")
        # carried state: every leaf sharded on channel only
        self.state_spec = tuple(P("channel") for _ in range(10))

        @partial(shard_map, mesh=mesh,
                 in_specs=(self.state_spec, self.x_spec),
                 out_specs=(self.state_spec, (self.x_spec, self.x_spec)),
                 check_vma=False)
        def step(state, x):
            from luaradio_tpu.parallel.time import (delay_sharded,
                                                    pilot_recovery_sharded)
            (disc_prev, ht_tail, bp_tail, dly_carry, lpr_tail, lmr_tail,
             dl_y, dl_f, dr_y, dr_f) = state
            axis = "time"
            from luaradio_tpu.ops.complexutil import const_complex
            bp_taps = const_complex(self._bp)

            # 1. discriminator (1-sample halo; carried sample on shard 0)
            prev = jnp.concatenate(
                [jnp.where(lax.axis_index(axis) == 0, disc_prev[..., None],
                           left_halo(x, 1, axis)), x[..., :-1]], axis=-1)
            t = x * jnp.conj(prev)
            m = jnp.arctan2(t.imag, t.real) * np.float32(
                1.0 / (2 * np.pi * self.gain))

            # 2. Hilbert transform -> analytic signal: imag = 129-tap FIR,
            # real = m delayed by the filter's 64-sample group delay
            im = fir_sharded(m, self.ht_taps, axis, tail=ht_tail)
            re = delay_sharded(m, self.group_delay, axis,
                               carry=ht_tail[..., -self.group_delay:])
            analytic = lax.complex(re, im)

            # 3. pilot recovery: 19 kHz bandpass -> normalize -> x2 phase
            carrier = pilot_recovery_sharded(analytic, bp_taps, 2, axis,
                                             tail=bp_tail)

            # 4. signal path delayed by the pilot filter's group delay
            d = delay_sharded(analytic, self.group_delay, axis,
                              carry=dly_carry)

            # 5. coherent subcarrier demod + AF filters
            mix = d * jnp.conj(carrier)
            lpr = fir_sharded(d.real, self.af_taps, axis, tail=lpr_tail)
            lmr = fir_sharded(mix.real, self.af_taps, axis, tail=lmr_tail)

            # 6. stereo matrix + deemphasis (distributed 1-pole recurrence)
            b0, b1 = np.float32(self._b[0]), np.float32(self._b[1])

            def deemph(f, y_prev, f_prev_last):
                f_prev = jnp.concatenate(
                    [jnp.where(lax.axis_index(axis) == 0,
                               f_prev_last[..., None],
                               left_halo(f, 1, axis)), f[..., :-1]], axis=-1)
                u = b0 * f + b1 * f_prev
                return linrec_first_order_sharded(u, -self._a1, y_prev, axis)

            l_raw = lpr + lmr
            r_raw = lpr - lmr
            yl = deemph(l_raw, dl_y, dl_f)
            yr = deemph(r_raw, dr_y, dr_f)
            left = yl[..., ::self.decimation]
            right = yr[..., ::self.decimation]

            def from_last(v):
                return lax.all_gather(v, axis)[-1]

            new_state = (from_last(x[..., -1]),
                         from_last(m[..., -128:]),
                         from_last(analytic[..., -128:]),
                         from_last(analytic[..., -self.group_delay:]),
                         from_last(d.real[..., -127:]),
                         from_last(mix.real[..., -127:]),
                         from_last(yl[..., -1]),
                         from_last(l_raw[..., -1]),
                         from_last(yr[..., -1]),
                         from_last(r_raw[..., -1]))
            return new_state, (left, right)

        self._step = step

    def init_state(self, n_channels: int):
        shard = NamedSharding(self.mesh, P("channel"))
        c = n_channels
        g = self.group_delay
        state = (jnp.zeros((c,), jnp.complex64),       # disc prev
                 jnp.zeros((c, 128), jnp.float32),     # hilbert tail (m)
                 jnp.zeros((c, 128), jnp.complex64),   # pilot bp tail
                 jnp.zeros((c, g), jnp.complex64),     # delay line
                 jnp.zeros((c, 127), jnp.float32),     # lpr fir tail
                 jnp.zeros((c, 127), jnp.float32),     # lmr fir tail
                 jnp.zeros((c,), jnp.float32),         # deemph L y[-1]
                 jnp.zeros((c,), jnp.float32),         # deemph L f[-1]
                 jnp.zeros((c,), jnp.float32),         # deemph R y[-1]
                 jnp.zeros((c,), jnp.float32))         # deemph R f[-1]
        return jax.device_put(state, shard)

    def jit_step(self):
        return jax.jit(self._step, donate_argnums=(0,))


__all__ = ["WBFMMonoBank", "WBFMStereoBank"]
