"""Source and sink golden tests (file round-trips across all 14 wire formats,
WAV round-trip, signal source waveforms, uniform random)."""

import numpy as np
import pytest

from luaradio_tpu import (IQFileSink, IQFileSource, RawFileSink, RawFileSource,
                          RealFileSink, RealFileSource, SignalSource,
                          UniformRandomSource, WAVFileSink, WAVFileSource,
                          ZeroSource)
from luaradio_tpu.core import CompositeBlock
from luaradio_tpu.types import Bit, Byte, ComplexFloat32, Float32
from luaradio_tpu.utils.format import FORMATS
from tests.jig import prepare_block, run_source

RNG = np.random.default_rng(9)


@pytest.mark.parametrize("fmt", sorted(FORMATS))
def test_iqfile_roundtrip(fmt, tmp_path):
    n = 4000
    x = ((RNG.uniform(-0.99, 0.99, n) + 1j * RNG.uniform(-0.99, 0.99, n))
         ).astype(np.complex64)
    path = str(tmp_path / f"t.{fmt}.iq")
    top = CompositeBlock()
    top.connect(_const_source(x), IQFileSink(path, fmt))
    top.run(chunk_size=1024)

    top2 = CompositeBlock()
    src = IQFileSource(path, fmt, 1e6)
    cap = _CaptureSink(ComplexFloat32)
    top2.connect(src, cap)
    top2.run(chunk_size=1024)
    got = np.concatenate(cap.chunks)
    assert len(got) == n
    eps = {"u8": 1e-2, "s8": 1e-2}.get(fmt, 1e-4)
    assert np.max(np.abs(got - x)) < eps


@pytest.mark.parametrize("fmt", ["u8", "s16le", "f32be", "f64le"])
def test_realfile_roundtrip(fmt, tmp_path):
    n = 4000
    x = RNG.uniform(-0.99, 0.99, n).astype(np.float32)
    path = str(tmp_path / f"t.{fmt}.bin")
    top = CompositeBlock()
    top.connect(_const_real_source(x), RealFileSink(path, fmt))
    top.run(chunk_size=1000)
    top2 = CompositeBlock()
    cap = _CaptureSink(Float32)
    top2.connect(RealFileSource(path, fmt, 1e6), cap)
    top2.run(chunk_size=1000)
    got = np.concatenate(cap.chunks)
    eps = 1e-2 if fmt == "u8" else 1e-4
    assert np.max(np.abs(got - x)) < eps


def test_rawfile_roundtrip(tmp_path):
    n = 3000
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
         ).astype(np.complex64)
    path = str(tmp_path / "t.raw")
    top = CompositeBlock()
    top.connect(_const_source(x), RawFileSink(path))
    top.run(chunk_size=512)
    top2 = CompositeBlock()
    cap = _CaptureSink(ComplexFloat32)
    top2.connect(RawFileSource(path, ComplexFloat32, 1e6), cap)
    top2.run(chunk_size=512)
    got = np.concatenate(cap.chunks)
    assert np.array_equal(got.view(np.float32), x.view(np.float32))


@pytest.mark.parametrize("bits", [8, 16, 32])
@pytest.mark.parametrize("nch", [1, 2])
def test_wav_roundtrip(bits, nch, tmp_path):
    n = 6000
    chans = [np.clip(RNG.standard_normal(n) * 0.4, -1, 1).astype(np.float32)
             for _ in range(nch)]
    path = str(tmp_path / "t.wav")

    top = CompositeBlock()
    srcs = [_const_real_source(c, rate=8000.0) for c in chans]
    sink = WAVFileSink(path, nch, bits_per_sample=bits)
    if nch == 1:
        top.connect(srcs[0], sink)
    else:
        for i, s in enumerate(srcs):
            top.connect(s, "out", sink, f"in{i+1}")
    top.run(chunk_size=1500)

    src = WAVFileSource(path, nch)
    src.initialize()
    assert src.get_rate() == 8000.0
    got = src.read(n)
    if nch == 1:
        got = (got,)
    eps = {8: 1e-2, 16: 1e-4, 32: 1e-6}[bits]
    for g, c in zip(got, chans):
        assert len(g) == n
        assert np.max(np.abs(g - c)) < eps


def test_zero_source():
    src = prepare_block(ZeroSource(ComplexFloat32, 1e3), [])
    y = run_source(src, 1000)
    assert y.dtype == np.complex64
    assert not y.any()


def test_signal_source_waveforms():
    rate, freq, n = 100.0, 7.0, 512
    t = np.arange(n)
    w = 2 * np.pi * freq / rate
    cases = {
        "exponential": np.exp(1j * w * t),
        "cosine": np.cos(w * t),
        "sine": np.sin(w * t),
    }
    for kind, exp in cases.items():
        src = prepare_block(SignalSource(kind, freq, rate), [])
        y = run_source(src, n, chunk=100)
        assert np.max(np.abs(y - exp)) < 1e-4, kind


def test_signal_source_square_triangle_sawtooth():
    rate, freq, n = 64.0, 1.7, 256
    phi = np.mod(2 * np.pi * freq / rate * np.arange(n), 2 * np.pi)
    square = np.where(phi < np.pi, 1.0, -1.0)
    triangle = np.where(phi < np.pi, 1 - (2 / np.pi) * phi,
                        -1 + (2 / np.pi) * (phi - np.pi))
    sawtooth = -1 + (1 / np.pi) * phi
    # exclude samples within float rounding of the waveform discontinuities
    ok = (np.abs(phi - np.pi) > 1e-3) & (phi > 1e-3) & (phi < 2 * np.pi - 1e-3)
    for kind, exp in [("square", square), ("triangle", triangle),
                      ("sawtooth", sawtooth)]:
        src = prepare_block(SignalSource(kind, freq, rate), [])
        y = run_source(src, n, chunk=64)
        assert np.max(np.abs((y - exp)[ok])) < 1e-4, kind


def test_signal_source_amplitude_offset():
    src = prepare_block(SignalSource("cosine", 10.0, 1000.0, amplitude=2.5,
                                     offset=0.5), [])
    y = run_source(src, 1000)
    assert abs(np.max(y) - 3.0) < 1e-3
    assert abs(np.min(y) + 2.0) < 1e-3


def test_uniform_random_source():
    for t, rng in [(ComplexFloat32, None), (Float32, None), (Byte, (10, 20)),
                   (Bit, None)]:
        src = prepare_block(UniformRandomSource(t, 1e3, range=rng, seed=4), [])
        y = run_source(src, 10000)
        assert y.dtype == t.dtype
        if t == Float32:
            assert -1.0 <= y.min() and y.max() < 1.0
            assert abs(np.mean(y)) < 0.05
        elif t == Byte:
            assert y.min() >= 10 and y.max() <= 20
        elif t == Bit:
            assert set(np.unique(y)) <= {0, 1}
            assert 0.4 < np.mean(y) < 0.6


# -- helpers ----------------------------------------------------------------

from luaradio_tpu.core.block import HostSourceBlock, Input, Output, SinkBlock


def _const_source(x, rate=1e6):
    class _Src(HostSourceBlock):
        def __init__(self):
            super().__init__()
            self.rate = rate
            self._pos = 0
            self.add_type_signature([], [Output("out", ComplexFloat32)])

        def read(self, n):
            if self._pos >= len(x):
                return None
            chunk = x[self._pos:self._pos + n]
            self._pos += len(chunk)
            return chunk
    return _Src()


def _const_real_source(x, rate=1e6):
    class _Src(HostSourceBlock):
        def __init__(self):
            super().__init__()
            self.rate = rate
            self._pos = 0
            self.add_type_signature([], [Output("out", Float32)])

        def read(self, n):
            if self._pos >= len(x):
                return None
            chunk = x[self._pos:self._pos + n]
            self._pos += len(chunk)
            return chunk
    return _Src()


class _CaptureSink(SinkBlock):
    def __init__(self, t):
        super().__init__()
        self.chunks = []
        self.add_type_signature([Input("in", t)], [])

    def process(self, x):
        self.chunks.append(np.asarray(x))
