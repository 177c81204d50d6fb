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
                        tau: float = 75e-6, num_taps: int = 128,
                        use_pallas: bool | None = None):
    """Returns (step, init_state) with
    step(state, x_payload[C, 2T] float32) -> (state, audio[C, T//decim]).

    ``use_pallas`` selects the fully-fused Pallas kernel
    (ops/wbfm_pallas.py — one HBM pass); default: on for TPU-shaped
    chunks, falling back to the fused-XLA path (identical math) when the
    chunk does not meet the kernel's tiling constraints."""
    nyq = if_rate / 2.0
    taps_lpf = filter_design.firwin_lowpass(num_taps, 15e3 / nyq)
    b, a = _singlepole_lowpass_coeffs(1.0 / (2 * np.pi * tau), if_rate)
    g = iir_to_fir_taps(b, a, tol=1e-10)
    assert g is not None  # deemphasis pole is strictly inside the circle
    taps = combine_taps(taps_lpf, g).astype(np.float32)
    # the Pallas kernel wants a 128-multiple tap count; trailing zeros
    # change nothing but the (zero-weighted) halo width
    k = -(-len(taps) // 128) * 128
    taps = np.concatenate([taps, np.zeros(k - len(taps), np.float32)])
    inv_gain = np.float32(1.0 / (2 * np.pi * 1.25))

    if use_pallas is None:
        import jax
        use_pallas = jax.default_backend() != "cpu"

    if use_pallas:
        # Fully-fused Pallas kernel: one HBM pass.  State is the last K
        # complex samples as interleaved payload (the kernel re-derives
        # the discriminator/FIR history from raw samples).
        from luaradio_tpu.ops.wbfm_pallas import make_wbfm_pallas
        # tile sweep on v5e (round 5): 16 frames/tile beat 8 by ~4% and
        # 32 by ~1.5%; VMEM stays under the 16 MiB scoped limit
        tile = 128 * decimation * 16
        fused = make_wbfm_pallas(taps, decimation, inv_gain, tile=tile)

        def init_state(n_channels: int):
            return (jnp.zeros((n_channels, 2 * k), jnp.float32),)

        def step(state, x_payload):
            carry, audio = fused(state[0], x_payload)
            return (carry,), audio

        return step, init_state

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
