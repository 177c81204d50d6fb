"""Generic time-axis sharding in the Runner.

A SINGLE-channel stream on an 8-virtual-device ("time",) mesh must equal
the serial run: every ordinary block exchanges its carried state as mesh
halos / distributed prefixes via the SignalBlock time-sharding contract.
This is the TPU analog of the reference's one-scheduler-for-every-graph
property (composite.lua:514-950): no hand-built bank required.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

import luaradio_tpu as lr
from luaradio_tpu.core.runtime import Runner
from luaradio_tpu.types import ComplexFloat32, Float32

RNG = np.random.default_rng(31)


def _mesh(shape, names):
    devs = np.array(jax.devices("cpu")[:int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _run(top, mesh=None, chunk_size=1 << 14, max_chunks=None):
    r = Runner(top, mode="fused", chunk_size=chunk_size, mesh=mesh)
    r.run(max_chunks=max_chunks)


def _wbfm_graph(iq_path, out_path, rate=256e3):
    """The rx_wbfm mono chain out of ORDINARY blocks (reference:
    composites/wbfmmonodemodulator.lua + tuner.lua)."""
    top = lr.CompositeBlock()
    top.connect(
        lr.IQFileSource(iq_path, "f32le", rate),
        lr.FrequencyTranslatorBlock(-50e3),
        lr.LowpassFilterBlock(64, 100e3),
        lr.FrequencyDiscriminatorBlock(1.25),
        lr.LowpassFilterBlock(32, 15e3, use_fft=False),
        lr.FMDeemphasisFilterBlock(75e-6),
        lr.DownsamplerBlock(8),
        lr.RealFileSink(str(out_path), "f32le"))
    return top


def test_wbfm_mono_time_sharded_equals_serial(tmp_path):
    n = 1 << 16
    x = (np.exp(1j * 0.3 * np.cumsum(RNG.standard_normal(n)))
         ).astype(np.complex64)
    iq = str(tmp_path / "x.iq")
    with open(iq, "wb") as f:
        f.write(x.tobytes())

    out_serial = tmp_path / "serial.f32"
    _run(_wbfm_graph(iq, out_serial))
    expect = np.fromfile(out_serial, dtype=np.float32)

    out_mesh = tmp_path / "mesh.f32"
    _run(_wbfm_graph(iq, out_mesh), mesh=_mesh((8,), ("time",)))
    got = np.fromfile(out_mesh, dtype=np.float32)

    assert got.shape == expect.shape
    assert np.max(np.abs(got - expect)) < 1e-5


def test_time_sharded_chunk_boundaries_match(tmp_path):
    """Carried state across CHUNK boundaries must also survive sharding:
    different chunk sizes give identical streams."""
    n = 1 << 15
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
         ).astype(np.complex64)
    iq = str(tmp_path / "x.iq")
    with open(iq, "wb") as f:
        f.write(x.tobytes())

    taps = RNG.standard_normal(33).astype(np.float32)
    outs = []
    for cs in (1 << 13, 1 << 15):
        out = tmp_path / f"o{cs}.f32"
        top = lr.CompositeBlock()
        top.connect(lr.IQFileSource(iq, "f32le", 1e6),
                    lr.FIRFilterBlock(taps, use_fft=False),
                    lr.FrequencyDiscriminatorBlock(2.0),
                    lr.RealFileSink(str(out), "f32le"))
        _run(top, mesh=_mesh((8,), ("time",)), chunk_size=cs)
        outs.append(np.fromfile(out, dtype=np.float32))
    assert outs[0].shape == outs[1].shape
    # sample 0 is atan2(+-0, +-0) of the discriminator's zero initial
    # state: its sign depends on sub-ulp rounding that varies with the
    # chunk framing (serial runs have the same property) — skip it
    assert np.max(np.abs(outs[0][1:] - outs[1][1:])) < 1e-6


def test_time_sharded_device_sources_and_recurrences(tmp_path):
    """Device sources (oscillator phase offsets per shard), IIR prefix
    scans, AGC data-dependent scans, and the FM modulator cumsum under
    ("time",) sharding."""
    def graph(out_path):
        top = lr.CompositeBlock()
        top.connect(
            lr.SignalSource("cosine", 1200.0, 48e3, amplitude=0.4),
            lr.FMPreemphasisFilterBlock(75e-6),
            lr.FrequencyModulatorBlock(0.1),
            lr.AGCBlock("fast"),
            lr.ComplexToRealBlock(),
            lr.RealFileSink(str(out_path), "f32le"))
        return top

    a = tmp_path / "serial.f32"
    _run(graph(a), max_chunks=6, chunk_size=1 << 13)
    b = tmp_path / "mesh.f32"
    _run(graph(b), mesh=_mesh((8,), ("time",)), max_chunks=6,
         chunk_size=1 << 13)
    xa = np.fromfile(a, dtype=np.float32)
    xb = np.fromfile(b, dtype=np.float32)
    assert xa.shape == xb.shape
    assert np.max(np.abs(xa - xb)) < 2e-5


def test_time_sharded_fft_fir_and_hilbert(tmp_path):
    """FFT overlap-save FIR (frame-tail halos) and the Hilbert transform
    under time sharding."""
    n = 1 << 16
    x = RNG.standard_normal(n).astype(np.float32)
    raw = str(tmp_path / "x.f32")
    with open(raw, "wb") as f:
        f.write(x.tobytes())

    taps = RNG.standard_normal(129).astype(np.float32)

    def graph(out_path):
        top = lr.CompositeBlock()
        top.connect(lr.RealFileSource(raw, "f32le", 1e6),
                    lr.FIRFilterBlock(taps, use_fft=True),
                    lr.HilbertTransformBlock(65),
                    lr.ComplexMagnitudeBlock(),
                    lr.RealFileSink(str(out_path), "f32le"))
        return top

    a = tmp_path / "serial.f32"
    _run(graph(a), chunk_size=1 << 15)
    b = tmp_path / "mesh.f32"
    _run(graph(b), mesh=_mesh((8,), ("time",)), chunk_size=1 << 15)
    xa = np.fromfile(a, dtype=np.float32)
    xb = np.fromfile(b, dtype=np.float32)
    assert xa.shape == xb.shape
    assert np.max(np.abs(xa - xb)) < 1e-4


def test_unsupported_block_raises_clearly():
    """A per-sample feedback loop (PLL) cannot time-shard: the Runner must
    say so by name, not crash deep in tracing."""
    top = lr.CompositeBlock()
    top.connect(lr.UniformRandomSource(ComplexFloat32, 1e6),
                lr.PLLBlock(100.0, 1e3, 2e3),
                lr.NopSink())
    with pytest.raises(NotImplementedError, match="PLLBlock"):
        _run(top, mesh=_mesh((8,), ("time",)), max_chunks=1)


def test_random_source_shards_deterministically(tmp_path):
    """UniformRandomSource under time sharding: per-shard independent
    streams, deterministic across runs."""
    def graph(out_path):
        top = lr.CompositeBlock()
        top.connect(lr.UniformRandomSource(Float32, 1e6, seed=7),
                    lr.MultiplyConstantBlock(2.0),
                    lr.RealFileSink(str(out_path), "f32le"))
        return top

    mesh = _mesh((8,), ("time",))
    a = tmp_path / "a.f32"
    _run(graph(a), mesh=mesh, max_chunks=3, chunk_size=1 << 13)
    b = tmp_path / "b.f32"
    _run(graph(b), mesh=mesh, max_chunks=3, chunk_size=1 << 13)
    xa = np.fromfile(a, dtype=np.float32)
    xb = np.fromfile(b, dtype=np.float32)
    assert xa.shape[0] >= 3 * (1 << 13)
    assert np.array_equal(xa, xb)
    # shards draw from folded subkeys: the 8 shard segments must differ
    seg = xa[:1 << 13].reshape(8, -1)
    assert not np.allclose(seg[0], seg[1])


def test_combined_channel_time_mesh_equals_serial(tmp_path):
    """Generic Runner on a ("channel", "time") mesh: a 2-channel bank with
    each stream's time axis sharded 4-way must equal per-channel serial
    runs (the generic form of the hand-fused parallel/wbfm.py banks)."""
    from luaradio_tpu.blocks.sources.bank import BankSource

    n = 1 << 14
    chans = []
    paths = []
    for c in range(2):
        z = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
             ).astype(np.complex64)
        p = str(tmp_path / f"c{c}.iq")
        z.view(np.float32).tofile(p)
        chans.append(z)
        paths.append(p)

    def graph(src, sink):
        top = lr.CompositeBlock()
        top.connect(src,
                    lr.FrequencyTranslatorBlock(-20e3),
                    lr.LowpassFilterBlock(48, 60e3, use_fft=False),
                    lr.FrequencyDiscriminatorBlock(1.25),
                    lr.FMDeemphasisFilterBlock(75e-6),
                    lr.DownsamplerBlock(4),
                    sink)
        return top

    # serial per-channel references
    refs = []
    for c in range(2):
        out = tmp_path / f"ref{c}.f32"
        _run(graph(lr.IQFileSource(paths[c], "f32le", 256e3),
                   lr.RealFileSink(str(out), "f32le")), chunk_size=1 << 13)
        refs.append(np.fromfile(out, dtype=np.float32))

    # banked + time-sharded in one mesh
    class Collect(lr.SinkBlock):
        def __init__(self):
            super().__init__()
            self.rows = []
            from luaradio_tpu.core.block import Input
            self.add_type_signature([Input("in", lambda t: True)], [])

        def process(self, x):
            self.rows.append(np.asarray(x))

    sink = Collect()
    src = BankSource([lr.IQFileSource(p, "f32le", 256e3) for p in paths])
    top = graph(src, sink)
    r = Runner(top, mode="fused", chunk_size=1 << 13,
               mesh=_mesh((2, 4), ("channel", "time")), channels=2)
    r.run()
    got = np.concatenate(sink.rows, axis=-1)
    assert got.shape == (2, refs[0].shape[0])
    for c in range(2):
        assert np.max(np.abs(got[c] - refs[c])) < 1e-5, c


def test_zero_crossing_clock_recovery_time_sharded(tmp_path):
    """ZCCR under ("time",) sharding: hysteresis prefix scan + distributed
    cummax + neighbor halos must reproduce the serial stream exactly."""
    rate, baud = 16.0, 1.0
    bits = RNG.integers(0, 2, 2048)
    x = (np.repeat(bits * 2.0 - 1.0, 16)
         + 0.05 * RNG.standard_normal(2048 * 16)).astype(np.float32)
    raw = str(tmp_path / "x.f32")
    x.tofile(raw)

    def graph(out_path):
        top = lr.CompositeBlock()
        top.connect(lr.RealFileSource(raw, "f32le", rate),
                    lr.ZeroCrossingClockRecoveryBlock(baud),
                    lr.RealFileSink(str(out_path), "f32le"))
        return top

    a = tmp_path / "serial.f32"
    _run(graph(a), chunk_size=1 << 13)
    b = tmp_path / "mesh.f32"
    _run(graph(b), mesh=_mesh((8,), ("time",)), chunk_size=1 << 13)
    xa = np.fromfile(a, dtype=np.float32)
    xb = np.fromfile(b, dtype=np.float32)
    assert xa.shape == xb.shape
    assert np.array_equal(xa, xb)


def test_sampler_masked_output_time_sharded(tmp_path):
    """SamplerBlock (masked device output) under ("time",) sharding: the
    clock-recovery + sampler bit path must emit the same compacted samples
    as the serial run — this is the RDS bit chain's device tail."""
    rate, baud = 16.0, 1.0
    bits = RNG.integers(0, 2, 1024)
    data = np.repeat(bits * 2.0 - 1.0, 16).astype(np.float32)
    data += 0.01 * RNG.standard_normal(data.shape[0]).astype(np.float32)
    raw = str(tmp_path / "x.f32")
    data.tofile(raw)

    def graph(sink):
        top = lr.CompositeBlock()
        src = lr.RealFileSource(raw, "f32le", rate)
        zccr = lr.ZeroCrossingClockRecoveryBlock(baud)
        sampler = lr.SamplerBlock()
        top.connect(src, zccr)
        top.connect(src, "out", sampler, "data")
        top.connect(zccr, "out", sampler, "clock")
        top.connect(sampler, lr.SlicerBlock(), sink)
        return top

    class Collect(lr.SinkBlock):
        def __init__(self):
            super().__init__()
            self.rows = []
            from luaradio_tpu.core.block import Input
            self.add_type_signature([Input("in", lambda t: True)], [])

        def process(self, x):
            self.rows.append(np.asarray(x))

    a, b = Collect(), Collect()
    rA = Runner(graph(a), mode="fused", chunk_size=1 << 12)
    rA.run()
    rB = Runner(graph(b), mode="fused", chunk_size=1 << 12,
                mesh=_mesh((8,), ("time",)))
    rB.run()
    xa = np.concatenate([r.reshape(-1) for r in a.rows])
    xb = np.concatenate([r.reshape(-1) for r in b.rows])
    assert xa.shape == xb.shape
    assert np.array_equal(xa, xb)
    assert xa.size >= 1000  # one sampled bit per symbol


def test_full_rds_receiver_time_sharded(tmp_path):
    """Capstone: the ENTIRE generic RDSReceiver — FM discriminator,
    Hilbert, pilot recovery, coherent demod, RRC, binary phase corrector,
    clock recovery, masked sampler, slicer, host Manchester/differential/
    framer/decoder — runs a SINGLE stream time-sharded over 4 devices and
    decodes the same RDS groups as the serial run."""
    import luaradio_tpu as radio
    from tests.core.test_receivers import ArraySource, CollectSink
    from tests.parallel.test_rds_bank import make_rds_fm
    from tests.blocks.test_protocol import rds_encode_group

    rate = 228000.0
    rng = np.random.default_rng(53)
    groups = [tuple(int(v) for v in rng.integers(0, 1 << 16, 4))
              for _ in range(6)]
    n = 1 << 18
    iq = make_rds_fm(n, groups)

    def decode(mesh, chunk):
        top = lr.CompositeBlock()
        sink = CollectSink()
        top.connect(ArraySource(iq, rate), radio.RDSReceiver(pilot="vector"),
                    sink)
        r = Runner(top, mode="fused", chunk_size=chunk, mesh=mesh)
        r.run()
        return {tuple(p.data["frame"]) for p in sink.items
                if p.data.get("type") == "raw"}

    serial = decode(None, 1 << 21)
    sharded = decode(_mesh((4,), ("time",)), 1 << 21)
    recovered_serial = [g for g in groups if g in serial]
    recovered_sharded = [g for g in groups if g in sharded]
    assert len(recovered_serial) >= 3
    assert recovered_sharded == recovered_serial, (serial, sharded)


def test_rds_tail_blocks_channel_time_mesh(tmp_path):
    """ZCCR + masked Sampler + Slicer (the RDS device bit tail) under a
    combined ("channel", "time") mesh: banked [C] state must broadcast
    against [C, T] streams (the blocks' [..., None] forms), and the banked
    masked outputs must compact per channel identically to serial runs."""
    from luaradio_tpu.blocks.sources.bank import BankSource

    rate, baud = 16.0, 1.0
    paths = []
    for c in range(2):
        bits = RNG.integers(0, 2, 768)
        data = np.repeat(bits * 2.0 - 1.0, 16).astype(np.float32)
        data += 0.01 * RNG.standard_normal(data.shape[0]).astype(np.float32)
        p = str(tmp_path / f"c{c}.f32")
        data.tofile(p)
        paths.append(p)

    def graph(src, sink):
        top = lr.CompositeBlock()
        zccr = lr.ZeroCrossingClockRecoveryBlock(baud)
        sampler = lr.SamplerBlock()
        top.connect(src, zccr)
        top.connect(src, "out", sampler, "data")
        top.connect(zccr, "out", sampler, "clock")
        top.connect(sampler, lr.SlicerBlock(), sink)
        return top

    class Collect(lr.SinkBlock):
        def __init__(self):
            super().__init__()
            self.rows = []
            from luaradio_tpu.core.block import Input
            self.add_type_signature([Input("in", lambda t: True)], [])

        def process(self, x):
            self.rows.append(x)

    # serial per-channel references
    refs = []
    for c in range(2):
        sink = Collect()
        r = Runner(graph(lr.RealFileSource(paths[c], "f32le", rate), sink),
                   mode="fused", chunk_size=1 << 12)
        r.run()
        refs.append(np.concatenate([np.asarray(x).reshape(-1)
                                    for x in sink.rows]))

    sink = Collect()
    src = BankSource([lr.RealFileSource(p, "f32le", rate) for p in paths])
    r = Runner(graph(src, sink), mode="fused", chunk_size=1 << 12,
               mesh=_mesh((2, 4), ("channel", "time")), channels=2)
    r.run()
    # the banked masked stream reaches the (uncloned) sink as one
    # per-channel process() call per chunk: rows alternate c0, c1, ...
    for c in range(2):
        got = np.concatenate([np.asarray(x).reshape(-1)
                              for x in sink.rows[c::2]])
        assert got.size >= 700, c
        assert np.array_equal(got, refs[c]), c


def test_replicated_sharded_state_mode_identical(tmp_path, monkeypatch):
    """LUARADIO_TPU_REPLICATE_SHARDED_STATE=1 (parallel/time.py
    shard0_state) genuinely replicates every halo-derived carried state
    from shard 0 instead of relying on the shard-0-only-reader invariant;
    the output stream must be bit-identical either way (ADVICE round-4:
    centralize + verify the invariant)."""
    n = 1 << 16
    x = (np.exp(1j * 0.3 * np.cumsum(RNG.standard_normal(n)))
         ).astype(np.complex64)
    iq = str(tmp_path / "x.iq")
    with open(iq, "wb") as f:
        f.write(x.tobytes())

    out_plain = tmp_path / "plain.f32"
    _run(_wbfm_graph(iq, out_plain), mesh=_mesh((8,), ("time",)),
         chunk_size=1 << 13)
    plain = np.fromfile(out_plain, dtype=np.float32)

    monkeypatch.setenv("LUARADIO_TPU_REPLICATE_SHARDED_STATE", "1")
    out_repl = tmp_path / "repl.f32"
    _run(_wbfm_graph(iq, out_repl), mesh=_mesh((8,), ("time",)),
         chunk_size=1 << 13)
    repl = np.fromfile(out_repl, dtype=np.float32)

    assert plain.shape == repl.shape
    assert np.array_equal(plain, repl)
