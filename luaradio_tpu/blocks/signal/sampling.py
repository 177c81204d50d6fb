"""Sample-rate and plumbing blocks.

TPU-native equivalents of the reference's
/root/reference/radio/blocks/signal/{downsampler,upsampler,delay,interleave,
deinterleave,nop,throttle}.lua.  Rate-changing blocks declare exact rational
rate ratios and chunk-multiple constraints so the graph planner keeps every
shape static; the per-call phase state the reference carries
(downsampler.lua:45-55) is unnecessary because chunks are always a multiple
of the decimation factor.
"""

from __future__ import annotations

import time
from fractions import Fraction

import numpy as np

import jax.numpy as jnp

from luaradio_tpu.core.block import HostBlock, Input, Output, SignalBlock
from luaradio_tpu.ops.layout import (decimate_pick, phase_merge,
                                     phase_split, upsample_zero_stuff)
from luaradio_tpu.types import Bit, Byte, ComplexFloat32, Float32


class DownsamplerBlock(SignalBlock):
    """y[n] = x[n*M] (reference: downsampler.lua)."""

    def __init__(self, factor: int):
        super().__init__()
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = int(factor)
        for t in (ComplexFloat32, Float32):
            self.add_type_signature([Input("in", t)], [Output("out", t)])

    def get_rate_ratio(self):
        return Fraction(1, self.factor)

    def chunk_multiple(self):
        return self.factor

    def process(self, state, x):
        # ops.layout lowers the stride-M pick to an MXU selection matmul on
        # TPU (a strided lane slice is ~6x slower than a raw read).
        return state, decimate_pick(x, self.factor)


class UpsamplerBlock(SignalBlock):
    """Zero-stuffing upsampler (reference: upsampler.lua)."""

    def __init__(self, factor: int):
        super().__init__()
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = int(factor)
        for t in (ComplexFloat32, Float32):
            self.add_type_signature([Input("in", t)], [Output("out", t)])

    def get_rate_ratio(self):
        return Fraction(self.factor)

    def process(self, state, x):
        return state, upsample_zero_stuff(x, self.factor)


class DelayBlock(SignalBlock):
    """Delay by N samples through a carried sample line
    (reference: delay.lua)."""

    def __init__(self, num_samples: int):
        super().__init__()
        if num_samples <= 0:
            raise ValueError("num_samples must be > 0")
        self.num_samples = int(num_samples)
        for t in (ComplexFloat32, Float32, Bit, Byte):
            self.add_type_signature([Input("in", t)], [Output("out", t)])

    def init_state(self):
        return jnp.zeros((self.num_samples,), dtype=self.get_input_type().dtype)

    def process(self, state, x):
        xin = jnp.concatenate([state, x], axis=-1)
        y = xin[..., :x.shape[-1]]
        new_state = xin[..., x.shape[-1]:]
        return new_state, y


class InterleaveBlock(SignalBlock):
    """Interleave N streams sample-by-sample into one stream at N-fold rate
    (reference: interleave.lua)."""

    def __init__(self, num_channels: int = 2):
        super().__init__()
        if num_channels < 2:
            raise ValueError("num_channels must be > 1")
        self.num_channels = int(num_channels)
        for t in (Float32, ComplexFloat32):
            ins = [Input(f"in{i+1}", t) for i in range(num_channels)]
            self.add_type_signature(ins, [Output("out", t)])

    def get_rate_ratio(self):
        return Fraction(self.num_channels)

    def process(self, state, *xs):
        return state, phase_merge(list(xs))


class DeinterleaveBlock(SignalBlock):
    """Deinterleave one stream into N streams at 1/N rate
    (reference: deinterleave.lua)."""

    def __init__(self, num_channels: int = 2):
        super().__init__()
        if num_channels < 2:
            raise ValueError("num_channels must be > 1")
        self.num_channels = int(num_channels)
        for t in (Float32, ComplexFloat32):
            outs = [Output(f"out{i+1}", t) for i in range(num_channels)]
            self.add_type_signature([Input("in", t)], outs)

    def get_rate_ratio(self):
        return Fraction(1, self.num_channels)

    def chunk_multiple(self):
        return self.num_channels

    def process(self, state, x):
        return state, tuple(phase_split(x, self.num_channels))


class NopBlock(SignalBlock):
    """Pass-through of any type (reference: nop.lua)."""

    def __init__(self):
        super().__init__()
        self.add_type_signature([Input("in", lambda t: True)],
                                [Output("out", lambda ts: ts[0])])

    def process(self, state, x):
        return state, x


class ThrottleBlock(HostBlock):
    """Host-side rate pacing for real-time sinks (audio, plotting).

    The reference adapts a per-chunk usleep with measured-rate feedback
    and doubles its chunk size when sleeps get too short
    (throttle.lua:30-110) — necessary because relative sleeps accumulate
    oversleep drift.  Here pacing is an ABSOLUTE schedule: chunk k is
    released at t0 + samples_sent/rate, so timer oversleep self-corrects
    and long runs cannot drift by construction.  Two elements of the
    reference's controller survive in adapted form:

    * measured-rate telemetry: ``actual_rate`` is re-estimated every
      ADJUST_PERIOD_S seconds (the reference's adjust loop prints the
      same; LUARADIO_TPU_DEBUG logs it);
    * bounded backlog: if the pump stalls longer than MAX_BACKLOG_S the
      schedule re-anchors, so recovery resumes paced output instead of
      bursting the accumulated debt unpaced (the reference's relative
      sleeps have the same property implicitly).
    """

    ADJUST_PERIOD_S = 0.5
    MAX_BACKLOG_S = 0.25

    def __init__(self, rate: float | None = None):
        super().__init__()
        self.rate_limit = rate
        self._t0 = None
        self._sent = 0
        self._adj_t = None
        self._adj_sent = 0
        #: most recent measured output rate (samples/s), None until the
        #: first adjust period completes
        self.actual_rate: float | None = None
        self.add_type_signature([Input("in", lambda t: True)],
                                [Output("out", lambda ts: ts[0])])

    def process(self, x):
        rate = self.rate_limit or self.get_rate()
        now = time.monotonic()
        if self._t0 is None:
            self._t0 = now
            self._adj_t = now
        self._sent += len(x)
        self._adj_sent += len(x)
        target = self._t0 + self._sent / rate
        delay = target - now
        if delay > 0:
            time.sleep(delay)
        elif -delay > self.MAX_BACKLOG_S:
            # stalled pump: cap the accumulated debt at MAX_BACKLOG_S
            # (schedule re-anchored to "now minus the allowed backlog"),
            # so recovery bursts at most that much before pacing resumes
            self._t0 = now - (self._sent / rate) - self.MAX_BACKLOG_S
        t = time.monotonic()
        if t - self._adj_t >= self.ADJUST_PERIOD_S:
            self.actual_rate = self._adj_sent / (t - self._adj_t)
            from luaradio_tpu.core import debug
            debug.printf("[ThrottleBlock] target %.2f | actual %.2f | "
                         "error %.2f", rate, self.actual_rate,
                         rate - self.actual_rate)
            self._adj_t = t
            self._adj_sent = 0
        return np.asarray(x)


__all__ = [
    "DownsamplerBlock", "UpsamplerBlock", "DelayBlock", "InterleaveBlock",
    "DeinterleaveBlock", "NopBlock", "ThrottleBlock",
]

# Aligned rate changers and pass-throughs are time-local: the chunk planner
# keeps every shard's chunk a multiple of their phase period, so per-shard
# process() is exact.  DelayBlock's state is its input tail, handled by the
# generic halo exchange.
for _cls in (DownsamplerBlock, UpsamplerBlock, InterleaveBlock,
             DeinterleaveBlock, NopBlock):
    _cls.time_local = True
del _cls
DelayBlock.tail_state = True
