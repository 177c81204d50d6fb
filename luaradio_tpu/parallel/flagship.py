"""Single-chip flagship step: the WBFM mono receiver chain as one fused
jittable function over [channels, time] chunks.

Used by __graft_entry__ (compile check) and bench.py (throughput).  The
input crosses the host->device boundary as interleaved float32 (see
ops.complexutil — TPU PJRT backends reject complex64 at program
boundaries).

TPU-native structure (one pass over HBM, everything else fused by XLA):

1. deinterleave -> (re, im): MXU selection matmul (ops.layout) — a
   stride-2 lane slice would relayout ~6x slower than the read itself;
2. discriminator: conj-multiply + atan2, fused elementwise on the VPU;
3. AF lowpass + FM deemphasis + decimation as ONE decimating FIR
   (ops.fir.fir_decimate): the deemphasis 1-pole IIR is folded into the
   FIR taps as its truncated impulse response (< 1e-10 tail), and only
   every D-th output is computed, as a banded-Toeplitz MXU matmul.

This is exactly what the graph optimizer (core/optimize.py) synthesizes
for the same chain built from ordinary blocks, so bench.py's raw-step and
Runner-driven numbers measure the same program modulo pump overhead.
Reference chain: /root/reference/radio/composites/wbfmmonodemodulator.lua
(discriminator -> 15 kHz LPF -> deemphasis) + downsampler.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from luaradio_tpu.blocks.signal.filtering import _singlepole_lowpass_coeffs
from luaradio_tpu.ops.complexutil import deinterleave
from luaradio_tpu.ops.fir import (combine_taps, fir_decimate,
                                  fir_decimate_init_state, iir_to_fir_taps)
from luaradio_tpu.utils import filter_design


def make_wbfm_mono_step(if_rate: float = 256e3, decimation: int = 8,
                        tau: float = 75e-6, num_taps: int = 128):
    """Returns (step, init_state) with
    step(state, x_payload[C, 2T] float32) -> (state, audio[C, T//decim])."""
    nyq = if_rate / 2.0
    taps_lpf = filter_design.firwin_lowpass(num_taps, 15e3 / nyq)
    b, a = _singlepole_lowpass_coeffs(1.0 / (2 * np.pi * tau), if_rate)
    g = iir_to_fir_taps(b, a, tol=1e-10)
    assert g is not None  # deemphasis pole is strictly inside the circle
    taps = combine_taps(taps_lpf, g).astype(np.float32)
    k = len(taps)
    inv_gain = np.float32(1.0 / (2 * np.pi * 1.25))

    def init_state(n_channels: int):
        c = n_channels
        return (jnp.zeros((c, 1), jnp.float32),       # disc prev (re)
                jnp.zeros((c, 1), jnp.float32),       # disc prev (im)
                fir_decimate_init_state(k, jnp.float32, (c,)))

    def step(state, x_payload):
        pr, pi, tail = state
        re, im = deinterleave(x_payload)
        rp = jnp.concatenate([pr, re[..., :-1]], axis=-1)
        ip = jnp.concatenate([pi, im[..., :-1]], axis=-1)
        tre = re * rp + im * ip
        tim = im * rp - re * ip
        m = jnp.arctan2(tim, tre) * inv_gain
        audio, tail = fir_decimate(m, taps, tail, decimation)
        return (re[..., -1:], im[..., -1:], tail), audio

    return step, init_state


__all__ = ["make_wbfm_mono_step"]
