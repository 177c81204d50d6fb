"""Device-resident sources: zero, signal generator, uniform random.

TPU-native equivalents of /root/reference/radio/blocks/sources/{zero,signal,
uniformrandom}.lua.  The reference fills vectors with per-sample Lua loops;
here each source is a pure JAX chunk generator fused into the device program,
so the "source" costs one elementwise kernel (or nothing, for zeros).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from luaradio_tpu.core.block import Output, SignalSourceBlock
from luaradio_tpu.ops.mixer import FracRamp, PhasorRamp
from luaradio_tpu.types import Bit, Byte, ComplexFloat32, Float32, SampleType


class ZeroSource(SignalSourceBlock):
    """Source of zero samples of any basic type (reference: zero.lua)."""

    def __init__(self, data_type: SampleType, rate: float):
        super().__init__()
        self.data_type = data_type
        self.rate = rate
        self.add_type_signature([], [Output("out", data_type)])

    time_local = True  # position-independent: per-shard generate is exact

    def generate(self, state, length: int):
        return state, jnp.zeros((length,), dtype=self.data_type.dtype)


#: Alias kept for reference parity (NullSource == ZeroSource there too).
NullSource = ZeroSource


class SignalSource(SignalSourceBlock):
    """Waveform generator: exponential (complex), cosine, sine, square,
    triangle, sawtooth, constant (reference: signal.lua:40-215).

    Waveforms are computed from a wrapped-phase position ramp built from
    float64 host tables (ops.mixer), so phase accuracy holds over unbounded
    streams; the carried state is one wrapped scalar.
    """

    WAVEFORMS = ("exponential", "cosine", "sine", "square", "triangle",
                 "sawtooth", "constant")

    def __init__(self, signal: str, frequency: float, rate: float,
                 amplitude: float = 1.0, offset: float = 0.0,
                 phase: float = 0.0):
        super().__init__()
        if signal not in self.WAVEFORMS:
            raise ValueError(f"unsupported signal {signal!r}")
        self.signal = signal
        self.frequency = float(frequency)
        self.rate = float(rate)
        self.amplitude = np.float32(amplitude)
        self.offset = np.float32(offset)
        self.phase = float(phase)
        out_t = ComplexFloat32 if signal == "exponential" else Float32
        self.add_type_signature([], [Output("out", out_t)])

    def initialize(self):
        omega = 2 * np.pi * self.frequency / self.rate
        if self.signal == "exponential":
            self._ramp = PhasorRamp(omega)
        elif self.signal in ("cosine", "sine", "square", "triangle", "sawtooth"):
            self._ramp = FracRamp(omega)

    def init_state(self):
        if self.signal == "exponential":
            return jnp.float32(self.phase)
        if self.signal == "constant":
            return None
        return jnp.float32((self.phase / (2 * np.pi)) % 1.0)

    def generate(self, state, length: int):
        a, off = self.amplitude, self.offset
        if self.signal == "constant":
            return state, jnp.full((length,), a, dtype=jnp.float32)
        if self.signal == "exponential":
            p, state = self._ramp.phasor(length, state)
            return state, (a.astype(jnp.complex64) * p).astype(jnp.complex64)
        pos, state = self._ramp.positions(length, state)
        two_pi = np.float32(2 * np.pi)
        if self.signal == "cosine":
            y = jnp.cos(pos * two_pi) * a + off
        elif self.signal == "sine":
            y = jnp.sin(pos * two_pi) * a + off
        elif self.signal == "square":
            y = jnp.where(pos < 0.5, a, -a) + off
        elif self.signal == "triangle":
            # 1 - (2/pi)*phi on [0, pi); -1 + (2/pi)*(phi-pi) on [pi, 2pi)
            y = jnp.where(pos < 0.5,
                          np.float32(1.0) - np.float32(4.0) * pos,
                          np.float32(4.0) * pos - np.float32(3.0)) * a + off
        else:  # sawtooth: -1 + (1/pi)*phi
            y = (np.float32(2.0) * pos - np.float32(1.0)) * a + off
        return state, y.astype(jnp.float32)

    def generate_sharded(self, state, length: int, axis_name: str):
        """Per-shard generation: offset the carried phase by
        omega * shard_index * length (reduced mod the waveform period in
        float64 at trace time) and advance the global state by the full
        chunk."""
        if self.signal == "constant":
            return self.generate(state, length)
        from jax import lax
        d = lax.axis_size(axis_name)
        idx = lax.axis_index(axis_name)
        omega = 2 * np.pi * self.frequency / self.rate
        if self.signal == "exponential":
            period, wrap = 2 * np.pi, np.float32(2 * np.pi)
        else:
            period, wrap = 1.0, np.float32(1.0)
            omega = omega / (2 * np.pi)
        offs = np.mod(omega * length * np.arange(d, dtype=np.float64),
                      period).astype(np.float32)
        _, y = self.generate(state + jnp.asarray(offs)[idx], length)
        new = state + np.float32(np.mod(omega * length * d, period))
        new = jnp.mod(new, wrap) if period == 1.0 else (
            new - wrap * jnp.round(new / wrap))
        return new, y


class UniformRandomSource(SignalSourceBlock):
    """Uniform random samples of any basic type
    (reference: uniformrandom.lua).  Device-resident: jax.random with a
    carried PRNG key, so random generation runs in-graph.  Uses the ``rbg``
    generator (XLA RngBitGenerator — hardware-accelerated on TPU) rather
    than threefry, which costs ~10 VPU ops/byte; the stream is only
    required to be uniform, not reproducible across jax versions."""

    def __init__(self, data_type: SampleType, rate: float, range=None,
                 seed: int | None = None):
        super().__init__()
        if data_type not in (ComplexFloat32, Float32, Byte, Bit):
            raise ValueError("unsupported data type")
        self.data_type = data_type
        self.rate = rate
        self.range = tuple(range) if range else None
        self.seed = 0 if seed is None else int(seed)
        self.add_type_signature([], [Output("out", data_type)])

    def init_state(self):
        # stored as raw uint32 key data (not a typed key): the runtime's
        # state fence and boundary tooling treat state leaves as plain
        # arrays; re-wrapped per generate() call (a free bitcast under jit)
        return jax.random.key_data(jax.random.key(self.seed, impl="rbg"))

    def generate(self, state, length: int):
        key, sub = jax.random.split(
            jax.random.wrap_key_data(state, impl="rbg"))
        key = jax.random.key_data(key)
        t = self.data_type
        if t == ComplexFloat32:
            a, b = self.range or (-1.0, 1.0)
            v = jax.random.uniform(sub, (2, length), jnp.float32,
                                   np.float32(a), np.float32(b))
            y = (v[0] + 1j * v[1]).astype(jnp.complex64)
        elif t == Float32:
            a, b = self.range or (-1.0, 1.0)
            y = jax.random.uniform(sub, (length,), jnp.float32,
                                   np.float32(a), np.float32(b))
        elif t == Byte:
            a, b = self.range or (0, 255)
            y = jax.random.randint(sub, (length,), int(a), int(b) + 1,
                                   jnp.int32).astype(jnp.uint8)
        else:  # Bit
            y = jax.random.randint(sub, (length,), 0, 2,
                                   jnp.int32).astype(jnp.uint8)
        return key, y

    def generate_sharded(self, state, length: int, axis_name: str):
        """Per-shard generation: fold the shard index into the subkey so
        every shard draws an independent stream; the carried key advances
        from the replicated state, identically on all shards."""
        from jax import lax
        idx = lax.axis_index(axis_name)
        key, sub = jax.random.split(
            jax.random.wrap_key_data(state, impl="rbg"))
        sub = jax.random.fold_in(sub, idx)
        _, y = self.generate(jax.random.key_data(sub), length)
        return jax.random.key_data(key), y


__all__ = ["ZeroSource", "NullSource", "SignalSource", "UniformRandomSource"]
