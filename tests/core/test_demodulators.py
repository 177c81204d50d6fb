"""Demodulator composite integration tests: AM envelope, AM synchronous,
SSB round-trip, NBFM — each on a synthesized modulated signal through the
full runtime."""

import numpy as np
import pytest

import luaradio_tpu as radio
from luaradio_tpu.core.composite import CompositeBlock
from tests.core.test_receivers import ArraySource, CollectSink

RNG = np.random.default_rng(123)


def _tone_snr(audio, rate, tone, seg=None):
    """Peak at `tone` vs the strongest other bin (coarse SNR check)."""
    if seg is None:
        seg = slice(len(audio) // 4, len(audio) // 4 + 16384)
    w = audio[seg] * np.hanning(seg.stop - seg.start)
    spec = np.abs(np.fft.rfft(w))
    n = len(w)
    idx = int(round(tone * n / rate))
    peak = spec[idx - 3:idx + 4].max()
    spec[max(0, idx - 20):idx + 21] = 0
    spec[:5] = 0  # ignore DC
    return peak / (spec.max() + 1e-12)


def test_am_envelope_demodulator():
    rate = 88200.0
    n = int(rate * 0.6)
    t = np.arange(n) / rate
    msg = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    iq = ((1.0 + msg) * np.exp(1j * 2 * np.pi * 0.0 * t)).astype(np.complex64)

    top = CompositeBlock()
    sink = CollectSink()
    top.connect(ArraySource(iq, rate), radio.AMEnvelopeDemodulator(5e3), sink)
    top.run(chunk_size=1 << 15)
    audio = np.asarray(sink.items)
    assert len(audio) == n
    assert _tone_snr(audio, rate, 1000.0) > 10


def test_am_synchronous_demodulator():
    rate = 88200.0
    ifreq = 10e3
    n = int(rate * 0.8)
    t = np.arange(n) / rate
    msg = 0.5 * np.sin(2 * np.pi * 800.0 * t)
    iq = ((1.0 + msg) * np.exp(1j * 2 * np.pi * ifreq * t)
          ).astype(np.complex64)

    top = CompositeBlock()
    sink = CollectSink()
    top.connect(ArraySource(iq, rate),
                radio.AMSynchronousDemodulator(ifreq, 5e3), sink)
    top.run(chunk_size=1 << 15)
    audio = np.asarray(sink.items)
    assert _tone_snr(audio, rate, 800.0) > 10


def test_nbfm_demodulator():
    rate = 44100.0
    n = int(rate * 0.5)
    t = np.arange(n) / rate
    msg = 0.8 * np.sin(2 * np.pi * 700.0 * t)
    phi = 2 * np.pi * 5e3 * np.cumsum(msg) / rate
    iq = np.exp(1j * phi).astype(np.complex64)

    top = CompositeBlock()
    sink = CollectSink()
    top.connect(ArraySource(iq, rate), radio.NBFMDemodulator(5e3, 4e3), sink)
    top.run(chunk_size=1 << 14)
    audio = np.asarray(sink.items)
    assert _tone_snr(audio, rate, 700.0) > 10


def test_ssb_modulator_demodulator_roundtrip():
    """SSBModulator (usb) -> SSBDemodulator (usb) recovers the audio tone;
    the opposite sideband demodulator rejects it."""
    rate = 44100.0
    n = int(rate * 0.8)
    t = np.arange(n) / rate
    msg = (0.5 * np.sin(2 * np.pi * 1200.0 * t)).astype(np.float32)

    class FloatSource(ArraySource):
        def __init__(self, data, rate):
            super().__init__(data, rate)
            from luaradio_tpu.core.block import Output
            from luaradio_tpu.types import Float32
            self.signatures.clear()
            self.add_type_signature([], [Output("out", Float32)])

    top = CompositeBlock()
    sink = CollectSink()
    top.connect(FloatSource(msg, rate), radio.SSBModulator("usb", 3e3),
                radio.SSBDemodulator("usb", 3e3), sink)
    top.run(chunk_size=1 << 14)
    audio = np.asarray(sink.items)
    assert _tone_snr(audio, rate, 1200.0) > 10

    # cross-sideband rejection: usb modulator into lsb demodulator
    top2 = CompositeBlock()
    sink2 = CollectSink()
    top2.connect(FloatSource(msg, rate), radio.SSBModulator("usb", 3e3),
                 radio.SSBDemodulator("lsb", 3e3), sink2)
    top2.run(chunk_size=1 << 14)
    rejected = np.asarray(sink2.items)
    seg = slice(n // 4, n // 4 + 16384)
    pass_power = np.sum(audio[seg] ** 2)
    rej_power = np.sum(rejected[seg] ** 2)
    assert rej_power < pass_power / 20
