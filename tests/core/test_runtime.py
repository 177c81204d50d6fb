"""End-to-end flow graph execution tests (analog of
/root/reference/tests/top_spec.lua): a 6-block graph run both fused (jitted
segments) and eager, compared against a host-side oracle."""

import os
import tempfile

import numpy as np
import pytest
import scipy.signal

from luaradio_tpu import (BenchmarkSink, CompositeBlock, DownsamplerBlock,
                          FIRFilterBlock, FrequencyDiscriminatorBlock,
                          IQFileSink, IQFileSource, LowpassFilterBlock,
                          MultiplyConjugateBlock, NopSink, RawFileSink,
                          RawFileSource, RealFileSink, SignalSource,
                          ZeroSource)
from luaradio_tpu.types import ComplexFloat32, Float32
from luaradio_tpu.utils import format as format_utils

RNG = np.random.default_rng(42)


def _write_iq(path, x, fmt="f32le"):
    with open(path, "wb") as f:
        f.write(format_utils.complex_to_bytes(
            x, format_utils.get_format(fmt)))


@pytest.mark.parametrize("mode", ["fused", "eager"])
def test_six_block_graph(mode, tmp_path):
    n = 50000
    x1 = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
          ).astype(np.complex64)
    x2 = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
          ).astype(np.complex64)
    f1, f2 = str(tmp_path / "a.iq"), str(tmp_path / "b.iq")
    fout = str(tmp_path / "out.f32")
    _write_iq(f1, x1)
    _write_iq(f2, x2)

    taps = scipy.signal.firwin(31, 0.4).astype(np.float32)

    top = CompositeBlock()
    src1 = IQFileSource(f1, "f32le", 1e6)
    src2 = IQFileSource(f2, "f32le", 1e6)
    mult = MultiplyConjugateBlock()
    fir = FIRFilterBlock(taps, use_fft=False)
    disc = FrequencyDiscriminatorBlock(5.0)
    ds = DownsamplerBlock(5)
    sink = RealFileSink(fout, "f32le")
    top.connect(src1, "out", mult, "in1")
    top.connect(src2, "out", mult, "in2")
    top.connect(mult, fir, disc, ds, sink)
    top.run(mode=mode, chunk_size=8192)

    got = np.fromfile(fout, dtype=np.float32)

    # oracle
    m = x1 * np.conj(x2)
    filt = scipy.signal.lfilter(taps.astype(np.float64), [1.0],
                                m.astype(np.complex128))
    prev = np.concatenate([[0j], filt[:-1]])
    demod = np.angle(filt * np.conj(prev)) / (2 * np.pi * 5.0)
    exp = demod[::5].astype(np.float32)

    assert len(got) == len(exp)
    assert np.max(np.abs(got - exp)) < 1e-4


def test_device_source_graph(tmp_path):
    """All-device graph: SignalSource -> FIR -> sink file."""
    fout = str(tmp_path / "out.f32")
    top = CompositeBlock()
    src = SignalSource("cosine", 1000.0, 48000.0)
    lpf = LowpassFilterBlock(65, 5000.0)
    sink = RealFileSink(fout, "f32le")
    top.connect(src, lpf, sink)
    top.run(max_chunks=3, chunk_size=4096)
    got = np.fromfile(fout, dtype=np.float32)
    assert len(got) == 3 * 4096
    # steady state amplitude ~1 cosine
    assert abs(np.max(got[1000:]) - 1.0) < 1e-2


def test_start_stop_wait():
    top = CompositeBlock()
    src = ZeroSource(ComplexFloat32, 1e6)
    sink = NopSink()
    top.connect(src, sink)
    top.start(chunk_size=4096)
    import time
    time.sleep(0.3)
    assert top.status()["running"]
    top.stop()
    assert not top.status()["running"]


def test_eof_collapses_graph(tmp_path):
    n = 10000  # not a multiple of the chunk size
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
         ).astype(np.complex64)
    f1 = str(tmp_path / "a.iq")
    fout = str(tmp_path / "o.iq")
    _write_iq(f1, x)
    top = CompositeBlock()
    top.connect(IQFileSource(f1, "f32le", 1e6), IQFileSink(fout, "f32le"))
    top.run(chunk_size=4096)
    got = np.fromfile(fout, dtype=np.float32)
    got = got[0::2] + 1j * got[1::2]
    assert len(got) == n
    assert np.max(np.abs(got - x)) < 1e-6


def test_crashing_block_raises():
    class CrashingSource(RawFileSource):
        def __init__(self):
            import io
            super().__init__(io.BytesIO(b"\0" * 64), ComplexFloat32, 1.0)

        def read(self, n):
            raise RuntimeError("deliberate crash")

    top = CompositeBlock()
    top.connect(CrashingSource(), NopSink())
    with pytest.raises(RuntimeError, match="deliberate crash"):
        top.run()


def test_benchmark_sink_json(tmp_path):
    import io
    import json
    buf = io.StringIO()
    top = CompositeBlock()
    top.connect(ZeroSource(ComplexFloat32, 1e6),
                BenchmarkSink(file=buf, use_json=True))
    top.run(max_chunks=5, chunk_size=65536)
    rec = json.loads(buf.getvalue())
    assert rec["samples_per_second"] > 0
    assert rec["bytes_per_second"] == rec["samples_per_second"] * 8


def test_crash_in_thread_surfaces_from_wait():
    """A block crash inside the pump thread must collapse the graph and
    re-raise from wait() — analog of the reference's child-exit supervision
    (/root/reference/tests/top_spec.lua:82-106)."""
    calls = {"cleanup": 0}

    class CrashingSource(RawFileSource):
        def __init__(self):
            import io
            super().__init__(io.BytesIO(b"\0" * 64), ComplexFloat32, 1.0)

        def read(self, n):
            raise RuntimeError("thread crash")

        def cleanup(self):
            calls["cleanup"] += 1
            super().cleanup()

    top = CompositeBlock()
    top.connect(CrashingSource(), NopSink())
    top.start()
    with pytest.raises(RuntimeError, match="thread crash"):
        top.wait()
    assert not top.status()["running"]
    assert calls["cleanup"] == 1  # cleanup exactly once


def test_crash_midstream_surfaces_and_cleans_up(tmp_path):
    """Crash after a few good chunks: wait() raises, downstream sink is
    cleaned up exactly once."""
    cleanups = []

    class FlakySource(RawFileSource):
        def __init__(self):
            import io
            super().__init__(io.BytesIO(b"\0" * (8 * 1 << 20)),
                             ComplexFloat32, 1e6)
            self.n_reads = 0

        def read(self, n):
            self.n_reads += 1
            if self.n_reads > 3:
                raise ValueError("flaky after 3 chunks")
            return super().read(n)

    class CountingSink(NopSink):
        def cleanup(self):
            cleanups.append(1)

    top = CompositeBlock()
    top.connect(FlakySource(), CountingSink())
    top.start(chunk_size=4096)
    with pytest.raises(ValueError, match="flaky after 3 chunks"):
        top.wait()
    assert sum(cleanups) == 1
