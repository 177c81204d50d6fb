"""Filter block golden tests against scipy oracles (the reference generates
its golden vectors from scipy.signal.lfilter too —
/root/reference/tests/blocks/signal/firfilter_spec.py:6-9)."""

import numpy as np
import pytest
import scipy.signal

from luaradio_tpu import (BandpassFilterBlock, BandstopFilterBlock,
                          ComplexBandpassFilterBlock, FIRFilterBlock,
                          FMDeemphasisFilterBlock, HighpassFilterBlock,
                          HilbertTransformBlock, IIRFilterBlock,
                          LowpassFilterBlock, SinglepoleHighpassFilterBlock,
                          SinglepoleLowpassFilterBlock)
from tests.jig import check_block, prepare_block, run_block

RNG = np.random.default_rng(7)
N = 8192


def cvec(n=N):
    return (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
            ).astype(np.complex64)


def fvec(n=N):
    return RNG.standard_normal(n).astype(np.float32)


@pytest.mark.parametrize("taps_kind", ["real", "complex"])
@pytest.mark.parametrize("in_kind", ["real", "complex"])
@pytest.mark.parametrize("ntaps", [1, 16, 128])
def test_fir_direct(taps_kind, in_kind, ntaps):
    if taps_kind == "complex" and in_kind == "real":
        pytest.skip("reference FIR has no real-input complex-taps signature")
    taps = (RNG.standard_normal(ntaps) +
            (1j * RNG.standard_normal(ntaps) if taps_kind == "complex" else 0))
    taps = taps.astype(np.complex64 if taps_kind == "complex" else np.float32)
    x = cvec() if in_kind == "complex" else fvec()
    exp = scipy.signal.lfilter(taps.astype(np.complex128 if taps_kind ==
                                           "complex" else np.float64),
                               [1.0], x.astype(np.complex128))
    if in_kind == "real" and taps_kind == "real":
        exp = exp.real
    check_block(lambda: FIRFilterBlock(taps, use_fft=False), [x], [exp],
                epsilon=1e-4)


@pytest.mark.parametrize("taps_kind", ["real", "complex"])
@pytest.mark.parametrize("in_kind", ["real", "complex"])
def test_fir_fft_overlap_save(taps_kind, in_kind):
    if taps_kind == "complex" and in_kind == "real":
        pytest.skip("no real-input complex-taps signature")
    ntaps = 129
    taps = (RNG.standard_normal(ntaps) +
            (1j * RNG.standard_normal(ntaps) if taps_kind == "complex" else 0))
    taps = taps.astype(np.complex64 if taps_kind == "complex" else np.float32)
    x = cvec(16384) if in_kind == "complex" else fvec(16384)
    exp = scipy.signal.lfilter(taps.astype(np.complex128), [1.0],
                               x.astype(np.complex128))
    if in_kind == "real" and taps_kind == "real":
        exp = exp.real
    check_block(lambda: FIRFilterBlock(taps, use_fft=True), [x], [exp],
                epsilon=1e-3, splits=(2048, 6144))


def test_fir_fft_matches_direct_streaming():
    """FFT and direct paths must agree bit-for-bit within FFT rounding even
    across chunk boundaries (unlike the reference, whose FFT path changes
    output chunking — firfilter.lua:56-62)."""
    taps = RNG.standard_normal(65).astype(np.float32)
    x = cvec(8192)
    b1 = prepare_block(FIRFilterBlock(taps, use_fft=False),
                       [__import__("luaradio_tpu").ComplexFloat32])
    b2 = prepare_block(FIRFilterBlock(taps, use_fft=True),
                       [__import__("luaradio_tpu").ComplexFloat32])
    y1 = run_block(b1, [x])[0]
    y2 = run_block(b2, [x], splits=(1024, 3072))[0]
    assert np.max(np.abs(y1 - y2)) < 1e-3


@pytest.mark.parametrize("in_kind", ["real", "complex"])
def test_iir_biquad(in_kind):
    b, a = scipy.signal.butter(2, 0.2)
    x = cvec(4096) if in_kind == "complex" else fvec(4096)
    exp = scipy.signal.lfilter(b, a, x.astype(np.complex128))
    if in_kind == "real":
        exp = exp.real
    check_block(lambda: IIRFilterBlock(b, a), [x], [exp], epsilon=1e-3)


def test_iir_5ff_3fb():
    """The reference benchmark config: 5 feedforward, 3 feedback taps."""
    b = RNG.standard_normal(5) * 0.1
    a = np.array([1.0, -0.4, 0.08])
    x = fvec(4096)
    exp = scipy.signal.lfilter(b, a, x.astype(np.float64))
    check_block(lambda: IIRFilterBlock(b, a), [x], [exp], epsilon=1e-3)


def _freq_response(taps, freqs, rate=2.0):
    w, h = scipy.signal.freqz(taps, worN=np.asarray(freqs) * np.pi * 2 / rate)
    return np.abs(h)


def test_lowpass_design():
    blk = prepare_block(LowpassFilterBlock(129, 0.2),
                        [__import__("luaradio_tpu").Float32], rate=2.0)
    taps = blk.taps
    assert abs(_freq_response(taps, [0.0])[0] - 1.0) < 1e-3  # passband
    assert _freq_response(taps, [0.6])[0] < 1e-2             # stopband


def test_highpass_design():
    blk = prepare_block(HighpassFilterBlock(129, 0.5),
                        [__import__("luaradio_tpu").Float32], rate=2.0)
    taps = blk.taps
    assert _freq_response(taps, [0.05])[0] < 1e-2
    assert abs(_freq_response(taps, [0.95])[0] - 1.0) < 1e-2


def test_bandpass_design():
    blk = prepare_block(BandpassFilterBlock(129, (0.2, 0.4)),
                        [__import__("luaradio_tpu").Float32], rate=2.0)
    taps = blk.taps
    assert abs(_freq_response(taps, [0.3])[0] - 1.0) < 1e-2
    assert _freq_response(taps, [0.05])[0] < 1e-2
    assert _freq_response(taps, [0.7])[0] < 1e-2


def test_bandstop_design():
    blk = prepare_block(BandstopFilterBlock(129, (0.2, 0.4)),
                        [__import__("luaradio_tpu").Float32], rate=2.0)
    taps = blk.taps
    assert _freq_response(taps, [0.3])[0] < 1e-2
    assert abs(_freq_response(taps, [0.02])[0] - 1.0) < 1e-2


def test_complex_bandpass_design():
    blk = prepare_block(ComplexBandpassFilterBlock(129, (0.1, 0.3)),
                        [__import__("luaradio_tpu").ComplexFloat32], rate=2.0)
    taps = blk.taps
    # single-sided: passband at +0.2, stopband at -0.2 (negative freq)
    n = np.arange(len(taps)) - (len(taps) - 1) / 2
    resp = lambda f: abs(np.sum(taps * np.exp(-1j * np.pi * f * n)))
    assert abs(resp(0.2) - 1.0) < 1e-2
    assert resp(-0.2) < 1e-2


def test_singlepole_lowpass_matches_scipy_bilinear():
    cutoff, rate = 100.0, 8000.0
    blk = prepare_block(SinglepoleLowpassFilterBlock(cutoff),
                        [__import__("luaradio_tpu").Float32], rate=rate)
    x = fvec(2048)
    exp = scipy.signal.lfilter(blk.b_taps, blk.a_taps, x.astype(np.float64))
    y = run_block(blk, [x])[0]
    assert np.max(np.abs(y - exp)) < 1e-4
    # -3 dB at the cutoff
    w, h = scipy.signal.freqz(blk.b_taps, blk.a_taps,
                              worN=[2 * np.pi * cutoff / rate])
    assert abs(abs(h[0]) - 1 / np.sqrt(2)) < 1e-2


def test_fm_deemphasis_is_onepole_at_tau():
    tau, rate = 75e-6, 48000.0
    blk = prepare_block(FMDeemphasisFilterBlock(tau),
                        [__import__("luaradio_tpu").Float32], rate=rate)
    fc = 1 / (2 * np.pi * tau)
    w, h = scipy.signal.freqz(blk.b_taps, blk.a_taps,
                              worN=[2 * np.pi * fc / rate])
    assert abs(abs(h[0]) - 1 / np.sqrt(2)) < 1e-2


def test_hilbert_transform():
    """Analytic signal: for a cosine input, output ~ exp(j*w*n) (delayed)."""
    ntaps = 129
    n = np.arange(N)
    w = 0.3 * np.pi
    x = np.cos(w * n).astype(np.float32)
    blk = prepare_block(HilbertTransformBlock(ntaps),
                        [__import__("luaradio_tpu").Float32])
    y = run_block(blk, [x], splits=(100, 1000))[0]
    d = (ntaps - 1) // 2
    expected = np.exp(1j * w * (n - d))
    # skip filter transient at both ends
    sl = slice(2 * ntaps, N - 2 * ntaps)
    err = np.abs(y[sl] - expected[sl])
    assert np.max(err) < 0.02


def test_pulse_matched_filter():
    """Reference semantics: symbol_period taps of +-1
    (pulsematchedfilter.lua)."""
    from luaradio_tpu import PulseMatchedFilterBlock
    x = fvec(1024)
    rate, baud = 8.0, 1.0  # 8 samples/symbol
    blk = prepare_block(PulseMatchedFilterBlock(baud),
                        [__import__("luaradio_tpu").Float32], rate=rate)
    assert np.array_equal(blk.taps, np.ones(8, np.float32))
    y = run_block(blk, [x], splits=(100, 500))[0]
    exp = scipy.signal.lfilter(np.ones(8), [1.0], x.astype(np.float64))
    assert np.max(np.abs(y - exp)) < 1e-4


def test_manchester_matched_filter():
    """Reference semantics: sp taps of -1 then sp taps of +1
    (manchestermatchedfilter.lua)."""
    from luaradio_tpu import ManchesterMatchedFilterBlock
    x = fvec(1024)
    rate, baud = 8.0, 2.0  # sp = 4
    blk = prepare_block(ManchesterMatchedFilterBlock(baud),
                        [__import__("luaradio_tpu").Float32], rate=rate)
    assert np.array_equal(blk.taps,
                          np.concatenate([-np.ones(4), np.ones(4)]
                                         ).astype(np.float32))
    y = run_block(blk, [x], splits=(64, 300))[0]
    taps = np.concatenate([-np.ones(4), np.ones(4)])
    exp = scipy.signal.lfilter(taps, [1.0], x.astype(np.float64))
    assert np.max(np.abs(y - exp)) < 1e-4
