"""Modulation / demodulation blocks.

TPU-native equivalents of the reference's
/root/reference/radio/blocks/signal/{frequencytranslator,frequencydiscriminator,
frequencymodulator,pulseamplitudemodulator,quadratureamplitudemodulator}.lua.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

import jax.numpy as jnp

from luaradio_tpu.core.block import Input, Output, SignalBlock
from luaradio_tpu.ops.complexutil import const_complex
from luaradio_tpu.ops.mixer import PhasorRamp
from luaradio_tpu.ops.scan import cumsum_phase
from luaradio_tpu.types import Bit, ComplexFloat32, Float32


class FrequencyTranslatorBlock(SignalBlock):
    """y = x * exp(j*2*pi*offset/rate * n): complex mixer via the split-table
    phasor ramp (reference: frequencytranslator.lua — VOLK rotator / liquid
    NCO per-sample loops)."""

    def __init__(self, offset: float):
        super().__init__()
        self.offset = float(offset)
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", ComplexFloat32)])

    def initialize(self):
        omega = 2 * np.pi * self.offset / self.get_rate()
        self._ramp = PhasorRamp(omega)

    def init_state(self):
        return jnp.float32(0.0)

    def process(self, state, x):
        y, phase = self._ramp.rotate(x, state)
        return phase, y

    def process_sharded(self, state, x, *, axis_name: str):
        # per-shard phase offset = omega * (shard index * local length),
        # reduced mod 2pi in float64 at trace time — no collectives at all
        from jax import lax
        two_pi = np.float32(2 * np.pi)
        n_local = x.shape[-1]
        d = lax.axis_size(axis_name)           # static under shard_map
        idx = lax.axis_index(axis_name)
        offs = np.mod(self._ramp.omega * n_local * np.arange(d, dtype=np.float64),
                      2 * np.pi).astype(np.float32)
        y, _ = self._ramp.rotate(x, state + jnp.asarray(offs)[idx])
        new = state + np.float32(np.mod(self._ramp.omega * n_local * d,
                                        2 * np.pi))
        new = new - two_pi * jnp.round(new / two_pi)
        return new, y


class FrequencyDiscriminatorBlock(SignalBlock):
    """y[n] = arg(x[n] * conj(x[n-1])) / (2*pi*modulation_index)
    (reference: frequencydiscriminator.lua:48-88, one-sample carried state)."""

    def __init__(self, modulation_index: float):
        super().__init__()
        self.gain = 2 * np.pi * float(modulation_index)
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", Float32)])

    def init_state(self):
        return jnp.zeros((), dtype=jnp.complex64)

    def process(self, state, x):
        prev = jnp.concatenate([state[..., None], x[..., :-1]], axis=-1)
        tmp = x * jnp.conj(prev)
        y = jnp.arctan2(tmp.imag, tmp.real) * np.float32(1.0 / self.gain)
        return x[..., -1], y

    def process_sharded(self, state, x, *, axis_name: str):
        # one circular halo (frequencydiscriminator.lua carries the same
        # single sample): interior shards use it as their previous sample,
        # shard 0 receives the global tail = next chunk's carry, so no
        # end-of-chunk all_gather is needed (state is read on shard 0 only)
        from jax import lax
        from luaradio_tpu.parallel.time import ring_halo, shard0_state
        idx = lax.axis_index(axis_name)
        recv = ring_halo(x, 1, axis_name)[..., 0]
        prev = jnp.where(idx == 0, state, recv)
        _, y = self.process(prev, x)
        return shard0_state(recv, axis_name), y


class FrequencyModulatorBlock(SignalBlock):
    """y[n] = exp(j*phi[n]), phi[n] = phi[n-1] + 2*pi*k*x[n]
    (reference: frequencymodulator.lua pure path)."""

    def __init__(self, modulation_index: float):
        super().__init__()
        self.modulation_index = float(modulation_index)
        self.add_type_signature([Input("in", Float32)],
                                [Output("out", ComplexFloat32)])

    def init_state(self):
        return jnp.float32(0.0)

    def process(self, state, x):
        delta = np.float32(2 * np.pi * self.modulation_index)
        phi, carry = cumsum_phase(x * delta, state)
        return carry, jnp.exp(1j * phi).astype(jnp.complex64)

    def process_sharded(self, state, x, *, axis_name: str):
        # the phase accumulator is a distributed cumulative sum; the carry
        # comes from the same gathered totals (one collective, replicated)
        from luaradio_tpu.parallel.time import cumsum_sharded
        delta = np.float32(2 * np.pi * self.modulation_index)
        two_pi = np.float32(2 * np.pi)
        psum, total = cumsum_sharded(x * delta, axis_name, with_total=True)
        phi = psum + state[..., None]
        carry = state + total
        carry = carry - two_pi * jnp.round(carry / two_pi)
        return carry, jnp.exp(1j * phi).astype(jnp.complex64)


def _gray(v: int) -> int:
    return v ^ (v >> 1)


class PulseAmplitudeModulatorBlock(SignalBlock):
    """Bits -> gray-coded M-level PAM at symbol_period samples per symbol
    (reference: pulseamplitudemodulator.lua)."""

    def __init__(self, symbol_rate: float, sample_rate: float, levels: int,
                 msb_first: bool = True, amplitudes=None):
        super().__init__()
        if levels < 2 or levels & (levels - 1):
            raise ValueError("levels must be a power of 2 and > 1")
        self.symbol_rate = symbol_rate
        self.sample_rate = sample_rate
        self.levels = levels
        self.symbol_bits = int(np.log2(levels))
        # floor of the true quotient, like the reference's math.floor
        # (pulseamplitudemodulator.lua:40) — NOT Python's a//b, whose
        # fmod-based result differs on exact-ratio floats (2.0//0.4 == 4.0
        # but floor(2.0/0.4) == 5); caught by the reference's shipped
        # golden vectors (tests/refparity)
        self.symbol_period = int(np.floor(sample_rate / symbol_rate))
        self.msb_first = msb_first
        if amplitudes is None:
            scaling = np.sqrt((levels ** 2 - 1) / 3.0)
            amplitudes = np.zeros(levels, dtype=np.float32)
            for level in range(levels):
                amplitudes[_gray(level)] = (2 * level - levels + 1) / scaling
        self.amplitudes = np.asarray(amplitudes, dtype=np.float32)
        self.add_type_signature([Input("in", Bit)], [Output("out", Float32)])

    def get_rate_ratio(self):
        return Fraction(self.symbol_period, self.symbol_bits)

    def chunk_multiple(self):
        return self.symbol_bits

    def _symbol_indices(self, x):
        b = self.symbol_bits
        lead = x.shape[:-1]
        bits = x.reshape(lead + (-1, b)).astype(jnp.int32)
        if self.msb_first:
            weights = 2 ** jnp.arange(b - 1, -1, -1, dtype=jnp.int32)
        else:
            weights = 2 ** jnp.arange(b, dtype=jnp.int32)
        return jnp.sum(bits * weights, axis=-1)

    def process(self, state, x):
        idx = self._symbol_indices(x)
        sym = jnp.asarray(self.amplitudes)[idx]
        y = jnp.repeat(sym, self.symbol_period, axis=-1)
        return state, y


class QuadratureAmplitudeModulatorBlock(PulseAmplitudeModulatorBlock):
    """Bits -> gray-coded square QAM constellation
    (reference: quadratureamplitudemodulator.lua)."""

    def __init__(self, symbol_rate: float, sample_rate: float, points: int,
                 msb_first: bool = True, constellation=None):
        if points < 2 or points & (points - 1):
            raise ValueError("points must be a power of 2 and > 1")
        symbol_bits = int(np.log2(points))
        if constellation is None:
            i_bits = -(-symbol_bits // 2)
            q_bits = symbol_bits - i_bits
            i_levels, q_levels = 2 ** i_bits, 2 ** q_bits
            scaling = np.sqrt(2 * (points - 1) / 3.0)
            constellation = np.zeros(points, dtype=np.complex64)
            for point in range(points):
                i_value = point >> q_bits
                q_value = point & (q_levels - 1)
                gray_point = (_gray(i_value) << q_bits) | _gray(q_value)
                constellation[gray_point] = complex(
                    2 * i_value - i_levels + 1,
                    2 * q_value - q_levels + 1) / scaling
        super().__init__(symbol_rate, sample_rate, points, msb_first,
                         amplitudes=np.zeros(points, dtype=np.float32))
        self.constellation = np.asarray(constellation, dtype=np.complex64)
        self.signatures.clear()
        self.add_type_signature([Input("in", Bit)],
                                [Output("out", ComplexFloat32)])

    def process(self, state, x):
        idx = self._symbol_indices(x)
        sym = const_complex(self.constellation)[idx]
        y = jnp.repeat(sym, self.symbol_period, axis=-1)
        return state, y


class DiscriminatorDecimatingFIRBlock(SignalBlock):
    """Fused FrequencyDiscriminator + DecimatingFIR as ONE Pallas pass
    over VMEM tiles (ops/wbfm_pallas.py make_disc_fir_pallas): the
    discriminated stream never round-trips through HBM between the atan2
    and the FIR.  Complex64 is planar inside XLA programs, so the
    kernel's re/im plane inputs are free views of the incoming stream.

    Available for explicit use; the automatic graph-optimizer
    substitution is OPT-IN (LUARADIO_TPU_FORCE_WBFM_KERNEL=1) because a
    pallas_call is a fusion barrier: mid-graph, materializing the
    producer's output for the custom call costs more than the saved
    round trip (measured on v5e — see core/optimize.py _fuse_disc_fir).
    The hand-fused flagship step (parallel/flagship.py), whose input is
    an already-materialized boundary payload, is where the one-pass
    kernel wins.

    State is the last K input samples (complex) — a pure input tail, so
    the generic halo exchange applies if ever sharded; the optimizer
    only synthesizes this block on unsharded graphs.
    """

    def __init__(self, taps, decimation: int, modulation_index: float):
        super().__init__()
        taps = np.asarray(taps, np.float32)
        k = -(-len(taps) // 128) * 128         # kernel wants 128-multiples
        self.taps = np.concatenate(
            [taps, np.zeros(k - len(taps), np.float32)])
        self.decimation = int(decimation)
        self.gain = 2 * np.pi * float(modulation_index)
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", Float32)])

    @classmethod
    def synth(cls, taps, decimation, modulation_index, rate,
              name_hint: str = ""):
        blk = cls(taps, decimation, modulation_index)
        blk.differentiate([ComplexFloat32])
        blk.input_rate = rate
        if name_hint:
            blk.name = f"DiscriminatorDecimatingFIRBlock[{name_hint}]"
        return blk

    def get_rate_ratio(self):
        return Fraction(1, self.decimation)

    def chunk_multiple(self):
        return self.decimation

    def initialize(self):
        from luaradio_tpu.ops.wbfm_pallas import make_disc_fir_pallas
        self._fused = make_disc_fir_pallas(
            self.taps, self.decimation, np.float32(1.0 / self.gain))

    def init_state(self):
        # last K complex samples (cold start: zeros; arg(0 * conj(0)) = 0
        # matches the unfused blocks' zero-state cold start)
        return jnp.zeros((len(self.taps),), dtype=jnp.complex64)

    #: single-stream chunks refold into this many contiguous rows so the
    #: kernel's VPU/MXU tiles use full sublanes (a [1, N] window uses 1
    #: of 8 sublanes); each row's carry is the preceding row's tail,
    #: available in the same chunk — exact, because the state is a pure
    #: input tail
    _REFOLD = 8

    def process(self, state, x):
        lead = x.shape[:-1]
        t = x.shape[-1]
        k = len(self.taps)
        d = self.decimation
        xm = x.reshape((-1, t))
        cm = jnp.broadcast_to(state, lead + (k,)).reshape((-1, k))
        r = self._REFOLD
        new_state = jnp.concatenate([cm, xm], axis=-1)[:, -k:]
        if (xm.shape[0] == 1 and t % (r * d) == 0 and t // r >= k
                and t // r % d == 0):
            tp = t // r
            rows = xm.reshape(r, tp)
            heads = jnp.concatenate(
                [cm] + [xm[:, rr * tp - k:rr * tp] for rr in range(1, r)],
                axis=0)
            audio = self._fused(jnp.real(heads), jnp.imag(heads),
                                jnp.real(rows), jnp.imag(rows))
            audio = audio.reshape(1, t // d)
        else:
            audio = self._fused(jnp.real(cm), jnp.imag(cm),
                                jnp.real(xm), jnp.imag(xm))
        return (new_state.reshape(lead + (k,)),
                audio.reshape(lead + (t // d,)))


__all__ = [
    "FrequencyTranslatorBlock", "FrequencyDiscriminatorBlock",
    "FrequencyModulatorBlock", "PulseAmplitudeModulatorBlock",
    "QuadratureAmplitudeModulatorBlock", "DiscriminatorDecimatingFIRBlock",
]

# Symbol mappers are time-local: the chunk planner keeps every shard's
# chunk a multiple of the symbol bit/period alignment.
PulseAmplitudeModulatorBlock.time_local = True
QuadratureAmplitudeModulatorBlock.time_local = True
