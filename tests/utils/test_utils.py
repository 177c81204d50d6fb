"""Utility tests: windows, filter design vs scipy, spectrum, formats, math."""

import numpy as np
import pytest
import scipy.signal

from luaradio_tpu.utils import filter_design, format as format_utils
from luaradio_tpu.utils.math import ceil_log2, is_pow2, next_pow2
from luaradio_tpu.utils.spectrum import PSD, dft, fftshift, idft
from luaradio_tpu.utils.window import window

RNG = np.random.default_rng(13)


@pytest.mark.parametrize("kind,scipy_name", [
    ("rectangular", "boxcar"), ("hamming", "hamming"), ("hanning", "hann"),
    ("bartlett", "bartlett"), ("blackman", "blackman")])
def test_windows_match_scipy(kind, scipy_name):
    for n in (16, 65, 128):
        w = window(n, kind)
        exp = scipy.signal.get_window(scipy_name, n, fftbins=False)
        assert np.max(np.abs(w - exp)) < 1e-9


def test_periodic_window():
    w = window(64, "hanning", periodic=True)
    exp = scipy.signal.get_window("hann", 64, fftbins=True)
    assert np.max(np.abs(w - exp)) < 1e-9


def test_lowpass_matches_scipy_firwin():
    taps = filter_design.firwin_lowpass(128, 0.25)
    exp = scipy.signal.firwin(128, 0.25, window="hamming")
    assert np.max(np.abs(taps - exp)) < 1e-6


def test_highpass_matches_scipy_firwin():
    taps = filter_design.firwin_highpass(129, 0.4)
    exp = scipy.signal.firwin(129, 0.4, window="hamming", pass_zero=False)
    assert np.max(np.abs(taps - exp)) < 1e-6


def test_bandpass_matches_scipy_firwin():
    taps = filter_design.firwin_bandpass(129, (0.2, 0.4))
    exp = scipy.signal.firwin(129, [0.2, 0.4], window="hamming",
                              pass_zero=False, scale=True)
    assert np.max(np.abs(taps - exp)) < 1e-6


def test_bandstop_matches_scipy_firwin():
    taps = filter_design.firwin_bandstop(129, (0.2, 0.4))
    exp = scipy.signal.firwin(129, [0.2, 0.4], window="hamming",
                              pass_zero=True)
    assert np.max(np.abs(taps - exp)) < 1e-6


def test_rrc_response():
    """RRC cascaded with itself = raised cosine: zero ISI at symbol spacing."""
    sps = 8
    taps = filter_design.fir_root_raised_cosine(129, sps, 0.35, 1.0)
    rc = np.convolve(taps, taps)
    center = len(rc) // 2
    # samples at multiples of the symbol period away from center ~ 0
    isi = [rc[center + k * sps] for k in range(1, 6)]
    assert np.max(np.abs(isi)) < 1e-3 * rc[center]


def test_hilbert_taps_antisymmetric():
    taps = filter_design.fir_hilbert_transform(63)
    assert np.max(np.abs(taps + taps[::-1])) < 1e-12
    assert np.all(taps[0::2] == 0) or np.all(taps[1::2] == 0)


def test_dft_idft():
    x = (RNG.standard_normal(256) + 1j * RNG.standard_normal(256)
         ).astype(np.complex64)
    X = np.asarray(dft(x))
    assert np.max(np.abs(X - np.fft.fft(x))) < 1e-3
    xr = np.asarray(idft(X))
    assert np.max(np.abs(xr - x)) < 1e-5


def test_fftshift():
    x = np.arange(8).astype(np.float32)
    assert np.array_equal(np.asarray(fftshift(x)), np.fft.fftshift(x))


def test_psd_parseval():
    """PSD of white noise integrates to its variance (within statistics)."""
    n = 1024
    navg = 64
    x = (RNG.standard_normal((navg, n)) + 1j * RNG.standard_normal((navg, n))
         ).astype(np.complex64)
    psd = PSD(n, "hanning", sample_rate=1.0, logarithmic=False)
    p = np.asarray(psd.compute(x)).mean(axis=0)
    total_power = p.sum() * (1.0 / n)  # integrate over normalized freq
    assert abs(total_power - 2.0) < 0.1  # var(real)+var(imag) = 2


def test_formats_roundtrip():
    x = np.clip(RNG.standard_normal(1000) * 0.4, -0.999, 0.999
                ).astype(np.float32)
    for name, fmt in format_utils.FORMATS.items():
        raw = format_utils.float_to_raw(x, fmt)
        back = format_utils.raw_to_float(raw, fmt)
        eps = 1e-2 if fmt.itemsize == 1 else 1e-4
        assert np.max(np.abs(back - x)) < eps, name


def test_math_utils():
    assert ceil_log2(1) == 0
    assert ceil_log2(2) == 1
    assert ceil_log2(3) == 2
    assert ceil_log2(1024) == 10
    assert is_pow2(64) and not is_pow2(48)
    assert next_pow2(100) == 128


def test_bits_helpers():
    from luaradio_tpu.types import bits_to_bytes, bits_to_number, number_to_bits
    bits = np.array([1, 0, 1, 1, 0, 0, 1, 0], dtype=np.uint8)
    assert bits_to_number(bits) == 0b10110010
    assert bits_to_number(bits, msb_first=False) == 0b01001101
    assert bits_to_bytes(bits) == bytes([0b10110010])
    assert np.array_equal(number_to_bits(0b10110010, 8), bits)
