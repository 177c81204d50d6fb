"""Graph-optimizer (LTI fusion) correctness: optimized graphs must produce
the same output as unoptimized ones within float tolerance — the analog of
the reference's acceleration-matrix CI, which runs every backend against
the same golden vectors (/root/reference/.github/workflows/tests.yml)."""

import numpy as np
import pytest
import scipy.signal

from luaradio_tpu import (CompositeBlock, DownsamplerBlock,
                          FIRFilterBlock, FMDeemphasisFilterBlock,
                          IIRFilterBlock, LowpassFilterBlock, RawFileSink,
                          RawFileSource, RealFileSink, RealFileSource)
from luaradio_tpu.core.composite import Graph
from luaradio_tpu.types import Float32

RNG = np.random.default_rng(3)


def _write_f32(path, x):
    np.asarray(x, np.float32).tofile(path)


def _run_graph(tmp_path, tag, build, optimize):
    fout = str(tmp_path / f"out_{tag}_{optimize}.f32")
    top, sink_path = build(fout)
    top.run(chunk_size=4096, optimize=optimize)
    return np.fromfile(sink_path, dtype=np.float32)


def test_fir_downsampler_fusion(tmp_path):
    n = 40000
    x = RNG.standard_normal(n).astype(np.float32)
    fin = str(tmp_path / "in.f32")
    _write_f32(fin, x)
    taps = scipy.signal.firwin(65, 0.2).astype(np.float32)

    def build(fout):
        top = CompositeBlock()
        top.connect(RealFileSource(fin, "f32le", 1e6),
                    FIRFilterBlock(taps, use_fft=False),
                    DownsamplerBlock(4),
                    RealFileSink(fout, "f32le"))
        return top, fout

    got_opt = _run_graph(tmp_path, "fd", build, True)
    got_ref = _run_graph(tmp_path, "fd", build, False)
    assert len(got_opt) == len(got_ref) == n // 4
    np.testing.assert_allclose(got_opt, got_ref, atol=2e-5)

    # the fused graph actually fused: FIR + Downsampler -> one block
    top, _ = build(str(tmp_path / "probe.f32"))
    g = Graph(top, chunk_size=4096, optimize=True)
    names = [b.name for b in g.order]
    assert any("DecimatingFIRBlock" in nm for nm in names)
    assert g.n_fusions >= 1


def test_fir_iir_downsampler_chain_fusion(tmp_path):
    """The WBFM mono tail: LPF -> deemphasis IIR -> downsample fuses into
    one decimating FIR; output must match the unfused scan path."""
    n = 50000
    x = RNG.standard_normal(n).astype(np.float32)
    fin = str(tmp_path / "in.f32")
    _write_f32(fin, x)

    def build(fout):
        top = CompositeBlock()
        top.connect(RealFileSource(fin, "f32le", 256e3),
                    LowpassFilterBlock(128, 15e3, use_fft=False),
                    FMDeemphasisFilterBlock(75e-6),
                    DownsamplerBlock(8),
                    RealFileSink(fout, "f32le"))
        return top, fout

    got_opt = _run_graph(tmp_path, "chain", build, True)
    got_ref = _run_graph(tmp_path, "chain", build, False)
    assert len(got_opt) == len(got_ref) == n // 8
    scale = max(1.0, np.max(np.abs(got_ref)))
    assert np.max(np.abs(got_opt - got_ref)) < 1e-4 * scale

    top, _ = build(str(tmp_path / "probe.f32"))
    g = Graph(top, chunk_size=4096, optimize=True)
    dev_blocks = [b for b in g.order if b.domain == "device"]
    assert len(dev_blocks) == 1  # LPF+deemph+down collapsed to one block


def test_lone_iir_conversion(tmp_path):
    n = 30000
    x = RNG.standard_normal(n).astype(np.float32)
    fin = str(tmp_path / "in.f32")
    _write_f32(fin, x)
    b_taps = np.array([0.1, 0.2, 0.1])
    a_taps = np.array([1.0, -0.8, 0.2])

    def build(fout):
        top = CompositeBlock()
        top.connect(RealFileSource(fin, "f32le", 1e6),
                    IIRFilterBlock(b_taps, a_taps),
                    RealFileSink(fout, "f32le"))
        return top, fout

    got_opt = _run_graph(tmp_path, "iir", build, True)
    exp = scipy.signal.lfilter(b_taps, a_taps, x.astype(np.float64))
    assert np.max(np.abs(got_opt - exp)) < 1e-4 * max(1, np.max(np.abs(exp)))

    top, _ = build(str(tmp_path / "probe.f32"))
    g = Graph(top, chunk_size=4096, optimize=True)
    assert any("DecimatingFIRBlock" in b.name for b in g.order)


def test_multi_consumer_edge_not_fused(tmp_path):
    """A FIR whose output feeds two sinks must not be fused away."""
    n = 8192
    x = RNG.standard_normal(n).astype(np.float32)
    fin = str(tmp_path / "in.f32")
    _write_f32(fin, x)
    taps = scipy.signal.firwin(31, 0.3).astype(np.float32)

    top = CompositeBlock()
    src = RealFileSource(fin, "f32le", 1e6)
    fir = FIRFilterBlock(taps, use_fft=False)
    ds = DownsamplerBlock(2)
    s1 = RealFileSink(str(tmp_path / "a.f32"), "f32le")
    s2 = RealFileSink(str(tmp_path / "b.f32"), "f32le")
    top.connect(src, fir)
    top.connect(fir, ds, s1)
    top.connect(fir, "out", s2, "in")
    top.run(chunk_size=2048, optimize=True)

    a = np.fromfile(str(tmp_path / "a.f32"), dtype=np.float32)
    b = np.fromfile(str(tmp_path / "b.f32"), dtype=np.float32)
    exp = scipy.signal.lfilter(taps.astype(np.float64), [1.0],
                               x.astype(np.float64))
    np.testing.assert_allclose(b, exp.astype(np.float32), atol=1e-5)
    np.testing.assert_allclose(a, exp[::2].astype(np.float32), atol=1e-5)


def test_unstable_iir_not_converted(tmp_path):
    """An IIR whose impulse response does not decay (pole on/near the unit
    circle) must stay an IIR scan.  (FMPreemphasis no longer qualifies:
    round 4 aligned it to the reference's stable single-pole highpass —
    fmpreemphasisfilter.lua:24-27 — so a hand-built integrator stands in.)"""
    from luaradio_tpu import IIRFilterBlock
    n = 8192
    x = RNG.standard_normal(n).astype(np.float32)
    fin = str(tmp_path / "in.f32")
    _write_f32(fin, x)
    top = CompositeBlock()
    leaky = IIRFilterBlock(np.array([1.0], np.float32),
                           np.array([1.0, -0.9999999], np.float32))
    top.connect(RealFileSource(fin, "f32le", 48e3), leaky,
                RealFileSink(str(tmp_path / "o.f32"), "f32le"))
    g = Graph(top, chunk_size=2048, optimize=True)
    assert leaky in g.order  # not rewritten


def test_disc_fir_pallas_fusion_matches_unfused(tmp_path, monkeypatch):
    """The opt-in discriminator+FIR Pallas substitution (forced on CPU
    via interpret mode) must reproduce the unfused chain across chunk
    boundaries within kernel tolerance."""
    import os
    import pytest
    if os.environ.get("LUARADIO_TPU_DISABLE_FUSION"):
        pytest.skip("optimizer disabled: no substitution to compare")
    import numpy as np
    import luaradio_tpu as lr
    from luaradio_tpu.core.runtime import Runner
    from luaradio_tpu.blocks.signal.modem import \
        DiscriminatorDecimatingFIRBlock

    rng = np.random.default_rng(5)
    n = 1 << 15
    x = (np.exp(1j * 0.25 * np.cumsum(rng.standard_normal(n)))
         ).astype(np.complex64)
    iq = str(tmp_path / "x.iq")
    x.view(np.float32).tofile(iq)

    def build(out):
        top = lr.CompositeBlock()
        top.connect(
            lr.IQFileSource(iq, "f32le", 256e3),
            lr.FrequencyTranslatorBlock(-50e3),
            lr.LowpassFilterBlock(64, 100e3, use_fft=False),
            lr.FrequencyDiscriminatorBlock(1.25),
            lr.LowpassFilterBlock(32, 15e3, use_fft=False),
            lr.FMDeemphasisFilterBlock(75e-6),
            lr.DownsamplerBlock(8),
            lr.RealFileSink(out, "f32le"))
        return top

    outs = {}
    for mode, env in (("fused_kernel", "LUARADIO_TPU_FORCE_WBFM_KERNEL"),
                      ("unfused", "LUARADIO_TPU_DISABLE_WBFM_KERNEL")):
        monkeypatch.setenv(env, "1")
        out = str(tmp_path / f"{mode}.f32")
        r = Runner(build(out), mode="fused", chunk_size=1 << 14)
        fused_blocks = [b for b in r.graph.order
                        if isinstance(b, DiscriminatorDecimatingFIRBlock)]
        assert bool(fused_blocks) == (mode == "fused_kernel")
        r.run()
        monkeypatch.delenv(env)
        outs[mode] = np.fromfile(out, dtype=np.float32)
    a, b = outs["fused_kernel"], outs["unfused"]
    assert a.shape == b.shape and a.size >= n // 8 - 64
    scale = max(float(np.max(np.abs(b))), 1e-3)
    assert np.max(np.abs(a - b)) < 2e-5 * scale
