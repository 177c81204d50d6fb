"""Generic mesh-aware Runner: ANY graph of ordinary blocks, run as a
channel bank sharded over the device mesh, must equal C independent
single-device runs (VERDICT item: composite.lua:514-950 runs every graph
under the reference's one parallelism model; the TPU analog is the banked
Segment in core/runtime.py)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from luaradio_tpu import (BankSource, CompositeBlock, DownsamplerBlock,
                          FrequencyDiscriminatorBlock, IQFileSource,
                          LowpassFilterBlock, FMDeemphasisFilterBlock,
                          RealFileSink, TunerBlock, WBFMMonoDemodulator)

RNG = np.random.default_rng(11)
C = 8


def _write_iq(path, z):
    np.asarray(z, np.complex64).view(np.float32).tofile(path)


def _make_channels(tmp_path, n):
    paths = []
    for c in range(C):
        z = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
             ).astype(np.complex64)
        p = str(tmp_path / f"ch{c}.iq")
        _write_iq(p, z)
        paths.append(p)
    return paths


class _CollectSink:
    """RealFileSink replacement capturing arrays in memory."""

    def __new__(cls):
        from luaradio_tpu.core.block import Input, SinkBlock

        class S(SinkBlock):
            def __init__(self):
                super().__init__()
                self.rows = []
                self.add_type_signature([Input("in", lambda t: True)], [])

            def process(self, x):
                self.rows.append(np.asarray(x))
        return S()


@pytest.mark.parametrize("optimize", [True, False])
def test_banked_wbfm_graph_equals_single_runs(tmp_path, optimize):
    n = 16384
    rate = 256e3
    paths = _make_channels(tmp_path, n)

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices), ("channel",))

    def build(src):
        top = CompositeBlock()
        sink = _CollectSink()
        top.connect(src,
                    WBFMMonoDemodulator(tau=75e-6),
                    DownsamplerBlock(8),
                    sink)
        return top, sink

    # banked run over the mesh
    bank = BankSource([IQFileSource(p, "f32le", rate) for p in paths])
    top, sink = build(bank)
    top.run(chunk_size=4096, mesh=mesh, optimize=optimize)
    banked = np.concatenate(sink.rows, axis=-1)
    assert banked.shape == (C, n // 8)

    # golden: each channel alone, single-device
    for c in range(C):
        top1, sink1 = build(IQFileSource(paths[c], "f32le", rate))
        top1.run(chunk_size=4096, optimize=optimize)
        single = np.concatenate([r.reshape(-1) for r in sink1.rows])
        np.testing.assert_allclose(banked[c], single, atol=2e-5)


def test_banked_device_source_graph():
    """Device sources (no host input at all) also run banked."""
    from luaradio_tpu import SignalSource
    devices = jax.devices()[:4]
    mesh = Mesh(np.asarray(devices), ("channel",))

    top = CompositeBlock()
    sink = _CollectSink()
    top.connect(SignalSource("cosine", 1000.0, 48000.0),
                LowpassFilterBlock(33, 5000.0, use_fft=False),
                sink)
    top.run(chunk_size=2048, max_chunks=3, mesh=mesh, channels=4)
    y = np.concatenate(sink.rows, axis=-1)
    assert y.shape == (4, 3 * 2048)
    # all channels identical (same source params/state)
    for c in range(1, 4):
        np.testing.assert_array_equal(y[c], y[0])
    assert abs(np.max(y[0, 500:]) - 1.0) < 1e-2


def test_mesh_runs_midgraph_host_block(tmp_path):
    """Round 3: mid-graph host blocks run banked (one clone per channel)
    as long as their outputs stay on the host side.  Host->device re-entry
    remains rejected (tests/parallel/test_mesh_host.py)."""
    from luaradio_tpu import ThrottleBlock, NopSink
    n = 4096
    paths = _make_channels(tmp_path, n)
    bank = BankSource([IQFileSource(p, "f32le", 1e6) for p in paths])
    top = CompositeBlock()
    top.connect(bank, ThrottleBlock(1e9), NopSink())
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("channel",))
    top.run(chunk_size=1024, mesh=mesh)


def test_flagship_step_matches_block_chain():
    """parallel.flagship (the bench kernel) must equal the ordinary-blocks
    WBFM mono chain within float tolerance — the bench measures a real
    receiver, not a lookalike."""
    import io
    import scipy.signal
    from luaradio_tpu.parallel.flagship import make_wbfm_mono_step
    from luaradio_tpu.blocks.signal.filtering import \
        _singlepole_lowpass_coeffs
    from luaradio_tpu.utils import filter_design

    if_rate, decim, tau, ntaps = 256e3, 8, 75e-6, 128
    c, t = 2, 8192
    z = (RNG.standard_normal((c, t)) + 1j * RNG.standard_normal((c, t))
         ).astype(np.complex64)

    step, init_state = make_wbfm_mono_step(if_rate, decim, tau, ntaps)
    state = init_state(c)
    outs = []
    for i in range(0, t, 2048):  # chunked: exercises streaming state
        pay = np.ascontiguousarray(z[:, i:i + 2048]).view(np.float32)
        state, audio = step(state, pay)
        outs.append(np.asarray(audio))
    got = np.concatenate(outs, axis=-1)

    # oracle: discriminator -> LPF -> deemphasis IIR -> decimate (float64)
    nyq = if_rate / 2
    taps = filter_design.firwin_lowpass(ntaps, 15e3 / nyq)
    b, a = _singlepole_lowpass_coeffs(1 / (2 * np.pi * tau), if_rate)
    for ch in range(c):
        x = z[ch].astype(np.complex128)
        prev = np.concatenate([[0j], x[:-1]])
        m = np.angle(x * np.conj(prev)) / (2 * np.pi * 1.25)
        f = scipy.signal.lfilter(taps, [1.0], m)
        y = scipy.signal.lfilter(b, a, f)
        exp = y[::decim]
        assert got[ch].shape == exp.shape
        scale = max(1.0, np.max(np.abs(exp)))
        assert np.max(np.abs(got[ch] - exp)) < 2e-5 * scale


def test_wbfm_pallas_kernel_matches_xla():
    """The fully-fused Pallas kernel (interpret mode on CPU) must match the
    fused-XLA flagship path across chunk boundaries."""
    from luaradio_tpu.parallel.flagship import make_wbfm_mono_step

    c, tile = 2, 128 * 8 * 16   # must equal the flagship kernel tile, or
    t = 2 * tile                # the kernel path silently falls back
    z = (RNG.standard_normal((c, t)) + 1j * RNG.standard_normal((c, t))
         ).astype(np.complex64)

    outs = {}
    for use_pallas in (False, True):
        step, init_state = make_wbfm_mono_step(use_pallas=use_pallas)
        st = init_state(c)
        chunks = []
        for i in range(0, t, tile):
            pay = np.ascontiguousarray(z[:, i:i + tile]).view(np.float32)
            st, audio = step(st, pay)
            chunks.append(np.asarray(audio))
        outs[use_pallas] = np.concatenate(chunks, axis=-1)
    a, b = outs[False], outs[True]
    assert a.shape == b.shape == (c, t // 8)
    scale = max(np.max(np.abs(a)), 1e-3)
    assert np.max(np.abs(a - b)) < 2e-5 * scale


def test_wbfm_pallas_fallback_on_ragged_chunk():
    """Chunks that are not a multiple of the kernel tile must route through
    the XLA fallback (same carry form, same math) — never silently truncate."""
    from luaradio_tpu.parallel.flagship import make_wbfm_mono_step

    c, t = 2, 128 * 8 * 3  # not a multiple of tile = 128*8*8
    z = (RNG.standard_normal((c, t)) + 1j * RNG.standard_normal((c, t))
         ).astype(np.complex64)
    pay = np.ascontiguousarray(z).view(np.float32)

    step_p, init_p = make_wbfm_mono_step(use_pallas=True)
    step_x, init_x = make_wbfm_mono_step(use_pallas=False)
    _, a = step_p(init_p(c), pay)
    _, b = step_x(init_x(c), pay)
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape == (c, t // 8)
    scale = max(np.max(np.abs(b)), 1e-3)
    assert np.max(np.abs(a - b)) < 2e-5 * scale
