"""Time+channel-sharded RDS front end.

The RDS receiver's full-rate stages — FM discriminator, Hilbert transform,
19 kHz pilot recovery with x3 phase multiplication, 57 kHz coherent
demodulation, baseband lowpass, and the RRC matched filter — run as ONE
shard_map program over a (channel, time) mesh, using the halo-exchange
primitives of parallel/time.py.  The pilot path is the vectorized
recovery (FIR + normalize + de Moivre), the time-shardable equivalent of
the reference's sequential pilot PLL (pll.lua:138-167); parity of the two
paths is covered by the serial receiver tests.

The output is the full-rate RRC'd BPSK soft-symbol stream.  Everything
downstream runs at 1187.5 baud — five decimal orders below the IF rate —
so clock recovery, sampling, Manchester/differential decode, framing, and
decoding stay on the ordinary single-device blocks; sharding them would
ship more halo bytes than data.

Reference topology: /root/reference/radio/composites/rdsreceiver.lua:24-56.
Validated sharded-vs-serial in tests/parallel/test_rds_bank.py, including
frame-level equality through the host bit path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from luaradio_tpu.parallel.time import (delay_sharded, fir_sharded, left_halo,
                                        pilot_recovery_sharded)
from luaradio_tpu.utils import filter_design


class RDSBank:
    """C-channel RDS full-rate front end over a (channel, time) mesh.

    step(state, x[C, T] complex) -> (state, soft[C, T] complex): the
    57 kHz-demodulated, RRC-matched BPSK stream at the IF rate.
    """

    def __init__(self, mesh: Mesh, if_rate: float = 228e3):
        self.mesh = mesh
        self.if_rate = if_rate
        nyq = if_rate / 2.0
        self.ht_taps = jnp.asarray(
            filter_design.fir_hilbert_transform(129).astype(np.float32))
        self._bp = filter_design.firwin_complex_bandpass(
            129, (18e3 / nyq, 20e3 / nyq)).astype(np.complex64)
        self.lpf_taps = jnp.asarray(
            filter_design.firwin_lowpass(128, 4e3 / nyq).astype(np.float32))
        self.rrc_taps = jnp.asarray(filter_design.fir_root_raised_cosine(
            101, if_rate, 1.0, 1.0 / 1187.5).astype(np.float32))
        self.gain = 1.25
        self.group_delay = 64  # (129-1)/2 pilot/Hilbert group delay

        self.x_spec = P("channel", "time")
        self.state_spec = tuple(P("channel") for _ in range(6))

        # check_vma=False: carried state is replicated over the time axis by
        # the trailing all_gather, which the static checker cannot infer.
        @partial(shard_map, mesh=mesh,
                 in_specs=(self.state_spec, self.x_spec),
                 out_specs=(self.state_spec, self.x_spec),
                 check_vma=False)
        def step(state, x):
            (disc_prev, ht_tail, dly_carry, bp_tail, lpf_tail,
             rrc_tail) = state
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

            # 2. Hilbert -> analytic (imag: 129-tap FIR, real: group delay)
            im = fir_sharded(m, self.ht_taps, axis, tail=ht_tail)
            re = delay_sharded(m, self.group_delay, axis,
                               carry=ht_tail[..., -self.group_delay:])
            analytic = lax.complex(re, im)

            # 3. pilot recovery: 19 kHz bandpass -> normalize -> x3 phase
            carrier = pilot_recovery_sharded(analytic, bp_taps, 3, axis,
                                             tail=bp_tail)

            # 4. signal path delayed by the pilot filter's group delay,
            #    57 kHz coherent demod
            d = delay_sharded(analytic, self.group_delay, axis,
                              carry=dly_carry)
            mix = d * jnp.conj(carrier)

            # 5. baseband lowpass + RRC matched filter (halo FIRs)
            bb = fir_sharded(mix, self.lpf_taps, axis, tail=lpf_tail)
            soft = fir_sharded(bb, self.rrc_taps, axis, tail=rrc_tail)

            def from_last(v):
                return lax.all_gather(v, axis)[-1]

            new_state = (from_last(x[..., -1]),
                         from_last(m[..., -128:]),
                         from_last(analytic[..., -self.group_delay:]),
                         from_last(analytic[..., -128:]),
                         from_last(mix[..., -127:]),
                         from_last(bb[..., -100:]))
            return new_state, soft

        self._step = step

    def init_state(self, n_channels: int):
        shard = NamedSharding(self.mesh, P("channel"))
        c = n_channels
        state = (jnp.zeros((c,), jnp.complex64),       # disc prev
                 jnp.zeros((c, 128), jnp.float32),     # hilbert tail (m)
                 jnp.zeros((c, self.group_delay), jnp.complex64),  # delay
                 jnp.zeros((c, 128), jnp.complex64),   # pilot bp tail
                 jnp.zeros((c, 127), jnp.complex64),   # lpf tail (mix)
                 jnp.zeros((c, 100), jnp.complex64))   # rrc tail (bb)
        return jax.device_put(state, shard)

    def jit_step(self):
        return jax.jit(self._step, donate_argnums=(0,))


__all__ = ["RDSBank"]
