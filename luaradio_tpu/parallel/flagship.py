"""Single-chip flagship step: the WBFM mono receiver chain as one fused
jittable function over [channels, time] chunks.

Used by __graft_entry__ (compile check) and bench.py (throughput).  The
input crosses the host->device boundary as interleaved float32 (see
ops.complexutil — TPU PJRT backends reject complex64 at program
boundaries); everything after the unpack is complex on-device.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from luaradio_tpu.blocks.signal.filtering import _singlepole_lowpass_coeffs
from luaradio_tpu.ops.complexutil import unpack_complex
from luaradio_tpu.ops.fir import fir_direct
from luaradio_tpu.ops.scan import linrec_first_order
from luaradio_tpu.utils import filter_design


def make_wbfm_mono_step(if_rate: float = 256e3, decimation: int = 8,
                        tau: float = 75e-6, num_taps: int = 128):
    """Returns (step, init_state) with
    step(state, x_payload[C, 2T] float32) -> (state, audio[C, T//decim])."""
    nyq = if_rate / 2.0
    taps = filter_design.firwin_lowpass(num_taps, 15e3 / nyq
                                        ).astype(np.float32)
    b, a = _singlepole_lowpass_coeffs(1.0 / (2 * np.pi * tau), if_rate)
    b0, b1, a1 = np.float32(b[0]), np.float32(b[1]), np.float32(a[1])
    inv_gain = np.float32(1.0 / (2 * np.pi * 1.25))

    def init_state(n_channels: int):
        c = n_channels
        return (jnp.zeros((c, 1), jnp.float32),       # disc prev (re)
                jnp.zeros((c, 1), jnp.float32),       # disc prev (im)
                jnp.zeros((c, num_taps - 1), jnp.float32),  # FIR tail
                jnp.zeros((c,), jnp.float32),         # deemph y[-1]
                jnp.zeros((c,), jnp.float32))         # deemph x[-1]

    def step(state, x_payload):
        pr, pi, fir_tail, deemph_y, f_last = state
        x = unpack_complex(x_payload)
        prev = jnp.concatenate(
            [jnp.asarray(pr) + 1j * jnp.asarray(pi), x[..., :-1]], axis=-1)
        t = x * jnp.conj(prev)
        m = jnp.arctan2(t.imag, t.real) * inv_gain
        f, fir_tail = fir_direct(m, jnp.asarray(taps), fir_tail)
        f_prev = jnp.concatenate([f_last[..., None], f[..., :-1]], axis=-1)
        u = b0 * f + b1 * f_prev
        y = linrec_first_order(u, -a1, deemph_y)
        audio = y[..., ::decimation]
        new_state = (x.real[..., -1:], x.imag[..., -1:], fir_tail,
                     y[..., -1], f[..., -1])
        return new_state, audio

    return step, init_state


__all__ = ["make_wbfm_mono_step"]
