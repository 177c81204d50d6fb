"""Polyphase channelizer vs the direct per-channel oracle
(y_c = decimate(lfilter(h * exp(-j2pi c k/C), x)))."""

import numpy as np
import pytest
import scipy.signal

RNG = np.random.default_rng(17)


def _oracle(x, h, c):
    ks = np.arange(len(h))
    outs = []
    for ch in range(c):
        hm = h * np.exp(2j * np.pi * ch * ks / c)
        z = scipy.signal.lfilter(hm, [1.0], x.astype(np.complex128))
        outs.append(z[0::c])
    return np.stack(outs)


@pytest.mark.parametrize("c,q", [(4, 8), (8, 6), (16, 4)])
def test_channelizer_oracle(c, q):
    from luaradio_tpu.blocks.signal.channelizer import ChannelizerBlock
    from luaradio_tpu.types import ComplexFloat32

    n = c * 256
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
         ).astype(np.complex64)

    blk = ChannelizerBlock(c, taps_per_branch=q)
    blk.differentiate([ComplexFloat32])
    blk.input_rate = 1e6
    blk.initialize()
    exp = _oracle(x, blk._proto, c)

    # whole-chunk
    st = blk.init_state()
    st, y = blk.process(st, x)
    got = np.asarray(y)
    assert got.shape == (c, n // c)
    assert np.max(np.abs(got - exp)) < 1e-5

    # chunked (streaming state across boundaries)
    st = blk.init_state()
    outs = []
    for i in range(0, n, c * 64):
        st, y = blk.process(st, x[i:i + c * 64])
        outs.append(np.asarray(y))
    got2 = np.concatenate(outs, axis=-1)
    assert np.max(np.abs(got2 - exp)) < 1e-5


def test_channelizer_isolates_tones():
    """Tones in different channels come out on their own channel with the
    others quiet."""
    from luaradio_tpu.blocks.signal.channelizer import ChannelizerBlock
    from luaradio_tpu.types import ComplexFloat32

    c, rate = 8, 800e3
    n = 8 * 2048
    t = np.arange(n) / rate
    # tone in channel 2 (200 kHz) and channel 5 (-300 kHz alias: 5*100k)
    x = (np.exp(2j * np.pi * 200e3 * t)
         + 0.5 * np.exp(2j * np.pi * 500e3 * t)).astype(np.complex64)

    blk = ChannelizerBlock(c, taps_per_branch=12)
    blk.differentiate([ComplexFloat32])
    blk.input_rate = rate
    blk.initialize()
    st, y = blk.process(blk.init_state(), x)
    p = np.mean(np.abs(np.asarray(y))[:, 256:] ** 2, axis=-1)
    assert p[2] > 100 * max(p[i] for i in range(c) if i not in (2, 5))
    assert p[5] > 100 * max(p[i] for i in range(c) if i not in (2, 5))


def test_channelizer_in_graph():
    """Channelizer output feeds ordinary blocks as a [C, time] batch."""
    import luaradio_tpu as radio
    from luaradio_tpu.core.composite import CompositeBlock
    from tests.core.test_receivers import ArraySource, CollectSink

    c = 4
    n = 4 * 4096
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
         ).astype(np.complex64)
    top = CompositeBlock()
    sink = CollectSink()
    top.connect(ArraySource(x, 1e6), radio.ChannelizerBlock(c),
                radio.ComplexMagnitudeBlock(), sink)
    top.run(chunk_size=4096)
    got = np.asarray(sink.items, np.float32)
    assert got.size == n  # c channels x n/c samples
