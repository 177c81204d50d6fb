"""Time+channel-sharded WBFM stereo bank vs the single-device block graph:
the sharded program (halo exchange + distributed recurrences + vectorized
pilot) must reproduce the ordinary-blocks demodulator bit-near-exactly,
including across chunk boundaries — the multi-node analog of the
reference's sample-by-sample streaming jig (SURVEY §4)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

import luaradio_tpu as radio
from luaradio_tpu.core.composite import CompositeBlock
from luaradio_tpu.parallel.wbfm import WBFMStereoBank
from tests.core.test_receivers import ArraySource, CollectSink
from tests.core.test_stereo import make_stereo_fm, RATE, TONE_L, TONE_R


def _serial_stereo(iq, decim=8):
    top = CompositeBlock()
    demod = radio.WBFMStereoDemodulator(pilot="vector")
    dsl, dsr = radio.DownsamplerBlock(decim), radio.DownsamplerBlock(decim)
    left, right = CollectSink(), CollectSink()
    top.connect(ArraySource(iq, RATE), demod)
    top.connect(demod, "left", dsl, "in")
    top.connect(demod, "right", dsr, "in")
    top.connect(dsl, "out", left, "in")
    top.connect(dsr, "out", right, "in")
    top.run(chunk_size=8192, optimize=False)
    return (np.asarray(left.items, np.float32),
            np.asarray(right.items, np.float32))


def test_stereo_bank_matches_serial():
    n_channels, t_chunk, n_chunks = 2, 8192, 2
    decim = 8
    n = t_chunk * n_chunks

    rng = np.random.default_rng(5)
    chans = []
    for c in range(n_channels):
        iq = make_stereo_fm(n)
        # decorrelate channels with a tiny phase rotation
        iq = (iq * np.exp(1j * rng.uniform(0, 2 * np.pi))
              ).astype(np.complex64)
        chans.append(iq)
    x_all = np.stack(chans)

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(2, 4), ("channel", "time"))
    bank = WBFMStereoBank(mesh, if_rate=RATE, decimation=decim)
    state = bank.init_state(n_channels)
    step = bank.jit_step()

    lefts, rights = [], []
    for k in range(n_chunks):
        xk = x_all[:, k * t_chunk:(k + 1) * t_chunk]
        state, (l, r) = step(state, xk)
        lefts.append(np.asarray(l))
        rights.append(np.asarray(r))
    bank_l = np.concatenate(lefts, axis=-1)
    bank_r = np.concatenate(rights, axis=-1)
    assert bank_l.shape == (n_channels, n // decim)

    for c in range(n_channels):
        ser_l, ser_r = _serial_stereo(chans[c], decim)
        scale = max(np.max(np.abs(ser_l)), 1e-3)
        assert np.max(np.abs(bank_l[c] - ser_l)) < 2e-4 * scale
        assert np.max(np.abs(bank_r[c] - ser_r)) < 2e-4 * scale


def test_stereo_bank_separation():
    """The sharded bank itself achieves real stereo separation."""
    n = 1 << 16
    iq = make_stereo_fm(n)
    x = np.stack([iq, iq])

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(2, 4), ("channel", "time"))
    bank = WBFMStereoBank(mesh, if_rate=RATE, decimation=8)
    state = bank.init_state(2)
    step = bank.jit_step()
    state, (l, r) = step(state, x)
    l, r = np.asarray(l)[0], np.asarray(r)[0]

    arate = RATE / 8

    def tone_power(xa, tone):
        w = xa[len(xa) // 2:] * np.hanning(len(xa) - len(xa) // 2)
        spec = np.abs(np.fft.rfft(w)) ** 2
        idx = int(round(tone * len(w) / arate))
        return spec[idx - 3:idx + 4].max()

    sep_l = tone_power(l, TONE_L) / tone_power(l, TONE_R)
    sep_r = tone_power(r, TONE_R) / tone_power(r, TONE_L)
    assert sep_l > 1000 and sep_r > 1000, (sep_l, sep_r)
