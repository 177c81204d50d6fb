"""WBFM stereo demodulation: the TPU-native vectorized pilot path must
recover L/R with strong stereo separation; the pilot-PLL path (bit-faithful
reference semantics, wbfmstereodemodulator.lua:28-64 + pll.lua:138-167)
is mono-correct but its doubled carrier carries an arbitrary constant
phase offset — the reference's phi_multiplied integrates freq*mult and
never phase-locks to mult*phi (pll.lua:153), so its L-R gain depends on
lock history.  Documented parity deviation: pilot="vector"
(PilotRecoveryBlock) is the recommended stereo path.
"""

import numpy as np
import pytest

import luaradio_tpu as radio
from luaradio_tpu.core.composite import CompositeBlock
from tests.core.test_receivers import ArraySource, CollectSink

RATE = 256e3
TONE_L, TONE_R = 800.0, 2100.0


def make_stereo_fm(n, rate=RATE):
    """Synthesize a broadcast-FM stereo multiplex capture."""
    t = np.arange(n) / rate
    left = 0.9 * np.sin(2 * np.pi * TONE_L * t)
    right = 0.9 * np.sin(2 * np.pi * TONE_R * t)
    mpx = (0.45 * (left + right)
           + 0.1 * np.cos(2 * np.pi * 19e3 * t)
           + 0.45 * (left - right) * np.cos(2 * np.pi * 38e3 * t))
    phase = 2 * np.pi * 1.25 * np.cumsum(mpx) / rate
    return np.exp(1j * phase).astype(np.complex64)


def _tone_power(x, rate, tone):
    w = x[len(x) // 2:] * np.hanning(len(x) - len(x) // 2)
    spec = np.abs(np.fft.rfft(w)) ** 2
    idx = int(round(tone * len(w) / rate))
    return spec[idx - 3:idx + 4].max()


def _noise_floor(x, rate):
    w = x[len(x) // 2:] * np.hanning(len(x) - len(x) // 2)
    spec = np.abs(np.fft.rfft(w)) ** 2
    return np.median(spec) + 1e-30


def _demod(iq, pilot, chunk_size=16384):
    top = CompositeBlock()
    demod = radio.WBFMStereoDemodulator(pilot=pilot)
    left, right = CollectSink(), CollectSink()
    top.connect(ArraySource(iq, RATE), demod)
    top.connect(demod, "left", left, "in")
    top.connect(demod, "right", right, "in")
    top.run(chunk_size=chunk_size)
    return (np.asarray(left.items, np.float32),
            np.asarray(right.items, np.float32))


def test_wbfm_stereo_vector_pilot_separation():
    n = 1 << 17
    iq = make_stereo_fm(n)
    l_audio, r_audio = _demod(iq, "vector")
    assert len(l_audio) == n
    sep_l = _tone_power(l_audio, RATE, TONE_L) / _tone_power(
        l_audio, RATE, TONE_R)
    sep_r = _tone_power(r_audio, RATE, TONE_R) / _tone_power(
        r_audio, RATE, TONE_L)
    # > 30 dB separation on a clean multiplex
    assert sep_l > 1000, f"left separation {10*np.log10(sep_l):.1f} dB"
    assert sep_r > 1000, f"right separation {10*np.log10(sep_r):.1f} dB"


def test_wbfm_stereo_pll_pilot_mono_path():
    """PLL mode: the L+R (mono) content must come through both channels
    regardless of the multiplied-carrier phase lottery."""
    n = 1 << 17
    iq = make_stereo_fm(n)
    l_audio, r_audio = _demod(iq, "pll")
    for audio in (l_audio, r_audio):
        for tone in (TONE_L, TONE_R):
            snr = _tone_power(audio, RATE, tone) / _noise_floor(audio, RATE)
            assert snr > 1e4, f"tone {tone} missing (snr {snr:.1f})"


def test_wbfm_stereo_vector_chunk_invariance():
    """Streaming state: different chunkings give identical audio."""
    n = 1 << 16
    iq = make_stereo_fm(n)
    a, _ = _demod(iq, "vector", chunk_size=16384)
    b, _ = _demod(iq, "vector", chunk_size=4096)
    np.testing.assert_allclose(a, b, atol=2e-5)
