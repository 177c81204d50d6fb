"""Filtering blocks.

TPU-native equivalents of the reference's filter family
(/root/reference/radio/blocks/signal/firfilter.lua, iirfilter.lua, and the
window-design wrappers lowpassfilter.lua .. fmpreemphasisfilter.lua,
hilberttransform.lua).  FIR filtering lowers to MXU convolution or FFT
overlap-save (luaradio_tpu.ops.fir); IIR recurrences lower to parallel
associative scans (luaradio_tpu.ops.scan).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from luaradio_tpu.core.block import Input, Output, SignalBlock
from luaradio_tpu.ops import fir as fir_ops
from luaradio_tpu.ops import scan as scan_ops
from luaradio_tpu.ops.complexutil import const_complex
from luaradio_tpu.types import ComplexFloat32, Float32
from luaradio_tpu.utils import filter_design


class FIRFilterBlock(SignalBlock):
    """Streaming FIR filter.

    Signatures mirror the reference (firfilter.lua:28-50): complex taps x
    complex input, real taps x complex input, real taps x real input.  The
    algorithm is direct MXU convolution for short filters and FFT
    overlap-save for taps > fft_threshold (reference auto-enables FFT for
    taps > 16 when FFTW is present, firfilter.lua:56-62).
    """

    FFT_THRESHOLD = 16

    def __init__(self, taps, use_fft: bool | None = None):
        super().__init__()
        taps = np.asarray(taps)
        if np.iscomplexobj(taps):
            self.taps = taps.astype(np.complex64)
            self.add_type_signature([Input("in", ComplexFloat32)],
                                    [Output("out", ComplexFloat32)])
        else:
            self.taps = taps.astype(np.float32)
            self.add_type_signature([Input("in", ComplexFloat32)],
                                    [Output("out", ComplexFloat32)])
            self.add_type_signature([Input("in", Float32)],
                                    [Output("out", Float32)])
        self.use_fft = use_fft

    def initialize(self):
        m = len(self.taps)
        if self.use_fft is None:
            self.use_fft = m > self.FFT_THRESHOLD
        if self.use_fft:
            self._l = fir_ops.fft_frame_length(m)
            real_in = self.get_input_type() == Float32
            self._real_fft = real_in and not np.iscomplexobj(self.taps)
            self._h_freq = fir_ops.fir_fft_freq_taps(self.taps, self._l,
                                                     self._real_fft)

    def _designed_num_taps(self) -> int:
        """Tap count after initialize(); overridden by design wrappers whose
        tap count depends on the propagated rate (the chunk planner runs
        before initialize)."""
        return len(self.taps)

    def chunk_multiple(self) -> int:
        m = self._designed_num_taps()
        use_fft = m > self.FFT_THRESHOLD if self.use_fft is None \
            else self.use_fft
        return fir_ops.fft_frame_length(m) if use_fft else 1

    def init_state(self):
        dtype = self.get_input_type().dtype
        if self.use_fft:
            return fir_ops.fir_fft_init_state(self._l, dtype)
        return fir_ops.fir_init_state(len(self.taps), dtype)

    def process(self, state, x):
        if self.use_fft:
            y, state = fir_ops.fir_fft(x, const_complex(self._h_freq), state,
                                       self._real_fft)
        else:
            y, state = fir_ops.fir_direct(x, const_complex(self.taps), state)
        return state, y

    def fir_equivalent(self):
        """Graph-optimizer protocol: this block's exact FIR taps (designed
        with the propagated rate when needed).  See core/optimize.py."""
        if isinstance(self, _DesignedFIRBlock):
            return np.asarray(self.design_taps())
        return np.asarray(self.taps)


class IIRFilterBlock(SignalBlock):
    """Direct-form IIR filter y = (b/a) * x as a parallel associative scan
    over the transposed-DF2 state space (reference: iirfilter.lua)."""

    def __init__(self, b_taps, a_taps):
        super().__init__()
        self.b_taps = np.asarray(b_taps, dtype=np.float64)
        self.a_taps = np.asarray(a_taps, dtype=np.float64)
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", ComplexFloat32)])
        self.add_type_signature([Input("in", Float32)],
                                [Output("out", Float32)])

    def _design_ba(self):
        """(b, a) coefficients; wrappers whose design depends on the
        propagated rate override this (it runs after rate validation)."""
        return self.b_taps, self.a_taps

    def initialize(self):
        self.b_taps, self.a_taps = self._design_ba()
        self._A, self._g, self._b0 = scan_ops.iir_state_space(
            self.b_taps, self.a_taps)

    def init_state(self):
        dtype = self.get_input_type().dtype
        return jnp.zeros((self._A.shape[0],), dtype=dtype)

    def process(self, state, x):
        y, state = scan_ops.iir_apply(x, jnp.asarray(self._A),
                                      jnp.asarray(self._g), self._b0, state)
        return state, y

    def process_sharded(self, state, x, *, axis_name: str):
        # distributed prefix over the order-p state space: local scans +
        # one all_gather of p-vector summaries (ops/scan.py)
        y, state = scan_ops.iir_apply_sharded(
            x, self._A, jnp.asarray(self._g), self._b0, state, axis_name)
        return state, y

    def fir_equivalent(self):
        """Graph-optimizer protocol: the truncated impulse response when the
        filter decays into float32 noise quickly enough, else None (keeps
        the associative-scan path).  See core/optimize.py."""
        b, a = self._design_ba()
        return fir_ops.iir_to_fir_taps(b, a, tol=1e-10)


class _DesignedFIRBlock(FIRFilterBlock):
    """FIR whose taps are designed at initialize() time from the propagated
    sample rate (like the reference wrappers, which design taps in
    initialize() using the differentiated rate)."""

    def __init__(self, num_taps: int, use_fft: bool | None = None,
                 complex_taps: bool = False):
        placeholder = (np.zeros(num_taps, dtype=np.complex64) if complex_taps
                       else np.zeros(num_taps, dtype=np.float32))
        super().__init__(placeholder, use_fft=use_fft)
        self.num_taps = num_taps

    def _designed_num_taps(self) -> int:
        return self.num_taps

    def design_taps(self) -> np.ndarray:
        raise NotImplementedError

    def initialize(self):
        taps = self.design_taps()
        if np.iscomplexobj(self.taps):
            self.taps = np.asarray(taps).astype(np.complex64)
        else:
            self.taps = np.asarray(taps).astype(np.float32)
        super().initialize()


class LowpassFilterBlock(_DesignedFIRBlock):
    def __init__(self, num_taps: int, cutoff: float, nyquist: float | None = None,
                 window: str = "hamming", use_fft: bool | None = None):
        super().__init__(num_taps, use_fft=use_fft)
        self.cutoff = cutoff
        self.nyquist = nyquist
        self.window = window

    def design_taps(self):
        nyq = self.nyquist or (self.get_rate() / 2.0)
        return filter_design.firwin_lowpass(self.num_taps, self.cutoff / nyq,
                                            self.window)


class HighpassFilterBlock(_DesignedFIRBlock):
    def __init__(self, num_taps: int, cutoff: float, nyquist: float | None = None,
                 window: str = "hamming", use_fft: bool | None = None):
        super().__init__(num_taps, use_fft=use_fft)
        self.cutoff = cutoff
        self.nyquist = nyquist
        self.window = window

    def design_taps(self):
        nyq = self.nyquist or (self.get_rate() / 2.0)
        return filter_design.firwin_highpass(self.num_taps, self.cutoff / nyq,
                                             self.window)


class BandpassFilterBlock(_DesignedFIRBlock):
    def __init__(self, num_taps: int, cutoffs, nyquist: float | None = None,
                 window: str = "hamming", use_fft: bool | None = None):
        super().__init__(num_taps, use_fft=use_fft)
        self.cutoffs = tuple(cutoffs)
        self.nyquist = nyquist
        self.window = window

    def design_taps(self):
        nyq = self.nyquist or (self.get_rate() / 2.0)
        return filter_design.firwin_bandpass(
            self.num_taps, (self.cutoffs[0] / nyq, self.cutoffs[1] / nyq),
            self.window)


class BandstopFilterBlock(_DesignedFIRBlock):
    def __init__(self, num_taps: int, cutoffs, nyquist: float | None = None,
                 window: str = "hamming", use_fft: bool | None = None):
        super().__init__(num_taps, use_fft=use_fft)
        self.cutoffs = tuple(cutoffs)
        self.nyquist = nyquist
        self.window = window

    def design_taps(self):
        nyq = self.nyquist or (self.get_rate() / 2.0)
        return filter_design.firwin_bandstop(
            self.num_taps, (self.cutoffs[0] / nyq, self.cutoffs[1] / nyq),
            self.window)


class ComplexBandpassFilterBlock(_DesignedFIRBlock):
    def __init__(self, num_taps: int, cutoffs, nyquist: float | None = None,
                 window: str = "hamming", use_fft: bool | None = None):
        super().__init__(num_taps, use_fft=use_fft, complex_taps=True)
        self.cutoffs = tuple(cutoffs)
        self.nyquist = nyquist
        self.window = window

    def design_taps(self):
        nyq = self.nyquist or (self.get_rate() / 2.0)
        return filter_design.firwin_complex_bandpass(
            self.num_taps, (self.cutoffs[0] / nyq, self.cutoffs[1] / nyq),
            self.window)


class ComplexBandstopFilterBlock(_DesignedFIRBlock):
    def __init__(self, num_taps: int, cutoffs, nyquist: float | None = None,
                 window: str = "hamming", use_fft: bool | None = None):
        super().__init__(num_taps, use_fft=use_fft, complex_taps=True)
        self.cutoffs = tuple(cutoffs)
        self.nyquist = nyquist
        self.window = window

    def design_taps(self):
        nyq = self.nyquist or (self.get_rate() / 2.0)
        return filter_design.firwin_complex_bandstop(
            self.num_taps, (self.cutoffs[0] / nyq, self.cutoffs[1] / nyq),
            self.window)


class RootRaisedCosineFilterBlock(_DesignedFIRBlock):
    def __init__(self, num_taps: int, beta: float, symbol_rate: float,
                 use_fft: bool | None = None):
        super().__init__(num_taps, use_fft=use_fft)
        self.beta = beta
        self.symbol_rate = symbol_rate

    def design_taps(self):
        return filter_design.fir_root_raised_cosine(
            self.num_taps, self.get_rate(), self.beta, 1.0 / self.symbol_rate)


class PulseMatchedFilterBlock(_DesignedFIRBlock):
    """Matched filter for a rectangular one-symbol pulse: symbol_period taps
    of +1 (-1 when inverted), exactly the reference's tap vector
    (pulsematchedfilter.lua)."""

    def __init__(self, baudrate: float, invert: bool = False):
        self.baudrate = baudrate
        self._invert = invert
        super().__init__(num_taps=1)

    def design_taps(self):
        n = max(1, int(self.get_rate() / self.baudrate))
        return np.full(n, -1.0 if self._invert else 1.0, dtype=np.float64)

    def _designed_num_taps(self) -> int:
        return max(1, int(self.get_rate() / self.baudrate))

    def initialize(self):
        n = max(1, int(self.get_rate() / self.baudrate))
        self.num_taps = n
        self.taps = np.zeros(n, dtype=np.float32)
        super().initialize()


class ManchesterMatchedFilterBlock(_DesignedFIRBlock):
    """Matched filter for a Manchester transition: symbol_period taps of -1
    followed by symbol_period taps of +1 (swapped when inverted), exactly
    the reference's tap vector (manchestermatchedfilter.lua:11-23)."""

    def __init__(self, baudrate: float, invert: bool = False):
        self.baudrate = baudrate
        self._invert = invert
        super().__init__(num_taps=2)

    def design_taps(self):
        sp = max(1, int(self.get_rate() / self.baudrate))
        first = 1.0 if self._invert else -1.0
        return np.concatenate([np.full(sp, first), np.full(sp, -first)])

    def _designed_num_taps(self) -> int:
        return 2 * max(1, int(self.get_rate() / self.baudrate))

    def initialize(self):
        sp = max(1, int(self.get_rate() / self.baudrate))
        self.num_taps = 2 * sp
        self.taps = np.zeros(self.num_taps, dtype=np.float32)
        super().initialize()


def _singlepole_lowpass_coeffs(cutoff: float, rate: float):
    """Bilinear-transform 1-pole lowpass H(s) = 1/(1 + s/wc) with
    prewarping (reference: singlepolelowpassfilter.lua)."""
    k = np.tan(np.pi * cutoff / rate)
    b = np.array([k / (1 + k), k / (1 + k)])
    a = np.array([1.0, (k - 1) / (1 + k)])
    return b, a


class SinglepoleLowpassFilterBlock(IIRFilterBlock):
    def __init__(self, cutoff: float):
        super().__init__([1.0], [1.0])
        self.cutoff = cutoff

    def _design_ba(self):
        return _singlepole_lowpass_coeffs(self.cutoff, self.get_rate())


class SinglepoleHighpassFilterBlock(IIRFilterBlock):
    """1-pole highpass H(s) = (s/wc)/(1 + s/wc) via bilinear transform
    (reference: singlepolehighpassfilter.lua)."""

    def __init__(self, cutoff: float):
        super().__init__([1.0], [1.0])
        self.cutoff = cutoff

    def _design_ba(self):
        k = np.tan(np.pi * self.cutoff / self.get_rate())
        return (np.array([1 / (1 + k), -1 / (1 + k)]),
                np.array([1.0, (k - 1) / (1 + k)]))


class FMDeemphasisFilterBlock(IIRFilterBlock):
    """FM deemphasis: 1-pole lowpass at 1/(2*pi*tau)
    (reference: fmdeemphasisfilter.lua:25-28)."""

    def __init__(self, tau: float):
        super().__init__([1.0], [1.0])
        self.tau = tau

    def _design_ba(self):
        cutoff = 1.0 / (2 * np.pi * self.tau)
        return _singlepole_lowpass_coeffs(cutoff, self.get_rate())


class FMPreemphasisFilterBlock(SinglepoleHighpassFilterBlock):
    """FM preemphasis: single-pole HIGHPASS at 1/(2*pi*tau), exactly the
    reference's delegation (fmpreemphasisfilter.lua:24-27 instantiates
    SinglepoleHighpassFilterBlock(1/(2*pi*tau))).  Verified against the
    reference's shipped golden vectors (tests/refparity); an earlier
    revision used the exact algebraic inverse of the deemphasis pole
    (pole at z=-1), which drifted ~1.0 from the reference's output."""

    def __init__(self, tau: float):
        super().__init__(1.0 / (2 * np.pi * tau))
        self.tau = tau


class DecimatingFIRBlock(SignalBlock):
    """Fused causal FIR + decimate-by-D, synthesized by the graph optimizer
    (core/optimize.py) from FIR/IIR/Downsampler chains: only every D-th
    convolution output is computed, as a banded-Toeplitz matmul on the MXU
    (ops.fir.fir_decimate).  The reference has no analog — its pipeline
    filters at full rate and discards 1-1/D of the output in the
    downsampler (/root/reference/radio/blocks/signal/downsampler.lua).

    Also constructible directly by users who want an explicit polyphase
    decimator."""

    def __init__(self, taps, decimation: int = 1):
        super().__init__()
        taps = np.asarray(taps)
        self.taps = (taps.astype(np.complex64) if np.iscomplexobj(taps)
                     else taps.astype(np.float32))
        self.decimation = int(decimation)
        if np.iscomplexobj(taps):
            self.add_type_signature([Input("in", ComplexFloat32)],
                                    [Output("out", ComplexFloat32)])
            self.add_type_signature([Input("in", Float32)],
                                    [Output("out", ComplexFloat32)])
        else:
            self.add_type_signature([Input("in", ComplexFloat32)],
                                    [Output("out", ComplexFloat32)])
            self.add_type_signature([Input("in", Float32)],
                                    [Output("out", Float32)])

    @classmethod
    def synth(cls, taps, decimation, in_type, rate, name_hint: str = ""):
        """Build a fully-differentiated instance for graph rewriting."""
        blk = cls(taps, decimation)
        blk.differentiate([in_type])
        blk.input_rate = rate
        if name_hint:
            blk.name = f"DecimatingFIRBlock[{name_hint}]"
        return blk

    def get_rate_ratio(self):
        from fractions import Fraction
        return Fraction(1, self.decimation)

    def _use_fft(self) -> bool:
        # rate-preserving with taps too tall for the framed matmul (e.g. a
        # slow-pole IIR converted to ~2k FIR taps): FFT overlap-save
        return (self.decimation == 1
                and len(self.taps) > fir_ops.decim_block_size(1))

    def chunk_multiple(self):
        if self._use_fft():
            return fir_ops.fft_frame_length(len(self.taps))
        return self.decimation

    def initialize(self):
        if self._use_fft():
            self._l = fir_ops.fft_frame_length(len(self.taps))
            self._real_fft = (self.get_input_type() == Float32
                              and not np.iscomplexobj(self.taps))
            self._h_freq = fir_ops.fir_fft_freq_taps(self.taps, self._l,
                                                     self._real_fft)

    def init_state(self):
        dtype = self.get_input_type().dtype
        if self._use_fft():
            return fir_ops.fir_fft_init_state(self._l, dtype)
        return fir_ops.fir_decimate_init_state(len(self.taps), dtype)

    def process(self, state, x):
        if self._use_fft():
            y, state = fir_ops.fir_fft(x, const_complex(self._h_freq), state,
                                       self._real_fft)
        else:
            y, state = fir_ops.fir_decimate(
                x, self.taps, state, self.decimation,
                block=fir_ops.decim_block_size(self.decimation))
        return state, y

    def fir_equivalent(self):
        return np.asarray(self.taps) if self.decimation == 1 else None


class HilbertTransformBlock(SignalBlock):
    """Real -> analytic signal: delayed real part + windowed-2/(pi n) FIR
    imaginary part (reference: hilberttransform.lua:1-16)."""

    def __init__(self, num_taps: int, window: str = "hamming"):
        super().__init__()
        if num_taps % 2 == 0:
            raise ValueError("HilbertTransformBlock requires odd num_taps")
        self.num_taps = num_taps
        self.taps = filter_design.fir_hilbert_transform(
            num_taps, window).astype(np.float32)
        self.add_type_signature([Input("in", Float32)],
                                [Output("out", ComplexFloat32)])

    def init_state(self):
        return fir_ops.fir_init_state(self.num_taps, np.float32)

    def process(self, state, x):
        m = self.num_taps
        c = (m - 1) // 2
        xin = jnp.concatenate([state, x], axis=-1)
        imag, new_tail = fir_ops.fir_direct(x, jnp.asarray(self.taps), state)
        real = xin[..., (m - 1) - c:(m - 1) - c + x.shape[-1]]
        return new_tail, real + 1j * imag


__all__ = [
    "FIRFilterBlock", "IIRFilterBlock", "DecimatingFIRBlock",
    "LowpassFilterBlock", "HighpassFilterBlock", "BandpassFilterBlock",
    "BandstopFilterBlock", "ComplexBandpassFilterBlock",
    "ComplexBandstopFilterBlock", "RootRaisedCosineFilterBlock",
    "PulseMatchedFilterBlock", "ManchesterMatchedFilterBlock",
    "SinglepoleLowpassFilterBlock", "SinglepoleHighpassFilterBlock",
    "FMDeemphasisFilterBlock", "FMPreemphasisFilterBlock",
    "HilbertTransformBlock",
]

# The FIR family carries pure input tails (fir_init_state/fir_fft_init_state/
# fir_decimate_init_state) — the generic ppermute halo exchange in
# SignalBlock.process_sharded is exact for them.
for _cls in (FIRFilterBlock, DecimatingFIRBlock, HilbertTransformBlock):
    _cls.tail_state = True
del _cls
