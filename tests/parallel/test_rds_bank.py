"""Time+channel-sharded RDS front end vs the single-device block graph:
the sharded program (halo-exchange FIRs + vectorized x3 pilot) must
reproduce the ordinary-blocks chain bit-near-exactly across chunk
boundaries, and its soft-symbol output must decode to the same RDS frames
through the host bit path."""

import numpy as np

import jax
from jax.sharding import Mesh

import luaradio_tpu as radio
from luaradio_tpu.core.composite import CompositeBlock
from luaradio_tpu.parallel.rds import RDSBank
from tests.core.test_receivers import (ArraySource, CollectSink, fm_modulate,
                                       manchester_diff_encode)
from tests.blocks.test_protocol import rds_encode_group

RATE = 228000.0  # 12 x 19 kHz
RNG = np.random.default_rng(11)


def make_rds_fm(n, groups):
    """FM-MPX baseband: 19 kHz pilot + 57 kHz BPSK RDS sidebands + audio."""
    bits = np.concatenate([rds_encode_group(g) for g in groups])
    chips = manchester_diff_encode(bits)
    chip_rate = 1187.5 * 2
    t = np.arange(n) / RATE
    chip_idx = np.minimum((t * chip_rate).astype(int), len(chips) - 1)
    bpsk = 2.0 * chips[chip_idx] - 1.0
    pilot = np.cos(2 * np.pi * 19e3 * t)
    carrier57 = np.cos(3 * 2 * np.pi * 19e3 * t)
    audio = 0.2 * np.sin(2 * np.pi * 800.0 * t)
    mpx = audio + 0.1 * pilot + 0.06 * bpsk * carrier57
    return fm_modulate(mpx, 1.0)


def _serial_front(iq):
    """The ordinary-blocks RDS full-rate front end (RDSReceiver 'vector'
    mode, composites/receivers.py) up to the RRC output."""
    top = CompositeBlock()
    disc = radio.FrequencyDiscriminatorBlock(1.25)
    hilb = radio.HilbertTransformBlock(129)
    delay = radio.DelayBlock(64)
    pilot = radio.PilotRecoveryBlock(129, (18e3, 20e3), multiplier=3)
    mixer = radio.MultiplyConjugateBlock()
    lpf = radio.LowpassFilterBlock(128, 4e3)
    rrc = radio.RootRaisedCosineFilterBlock(101, 1, 1187.5)
    sink = CollectSink()
    top.connect(ArraySource(iq, RATE), disc, hilb, delay)
    top.connect(hilb, pilot)
    top.connect(delay, "out", mixer, "in1")
    top.connect(pilot, "out", mixer, "in2")
    top.connect(mixer, lpf, rrc, sink)
    top.run(chunk_size=8192, optimize=False)
    return np.asarray(sink.items, np.complex64)


def _run_bank(x_all, t_chunk):
    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(2, 4), ("channel", "time"))
    bank = RDSBank(mesh, if_rate=RATE)
    state = bank.init_state(x_all.shape[0])
    step = bank.jit_step()
    outs = []
    for k in range(x_all.shape[-1] // t_chunk):
        state, soft = step(state, x_all[:, k * t_chunk:(k + 1) * t_chunk])
        outs.append(np.asarray(soft))
    return np.concatenate(outs, axis=-1)


def test_rds_bank_matches_serial():
    n_channels, t_chunk, n_chunks = 2, 8192, 2
    n = t_chunk * n_chunks
    groups = [tuple(int(v) for v in RNG.integers(0, 1 << 16, 4))
              for _ in range(2)]
    chans = []
    for _ in range(n_channels):
        iq = (make_rds_fm(n, groups)
              * np.exp(1j * RNG.uniform(0, 2 * np.pi))).astype(np.complex64)
        chans.append(iq)
    x_all = np.stack(chans)

    soft = _run_bank(x_all, t_chunk)
    assert soft.shape == (n_channels, n)
    for c in range(n_channels):
        ser = _serial_front(chans[c])
        scale = max(np.max(np.abs(ser)), 1e-3)
        assert np.max(np.abs(soft[c] - ser)) < 2e-4 * scale


def test_rds_bank_frames_decode():
    """The sharded front end's soft stream must decode to the transmitted
    RDS groups through the ordinary bit-path blocks."""
    groups = [tuple(int(v) for v in RNG.integers(0, 1 << 16, 4))
              for _ in range(6)]
    t_chunk = 8192
    bits_n = len(groups) * 104
    n = int(bits_n * 2 * RATE / (1187.5 * 2)) + int(RATE * 0.05)
    n = (n // t_chunk + 1) * t_chunk
    iq = make_rds_fm(n, groups)
    soft = _run_bank(np.stack([iq, iq]), t_chunk)[0]

    top = CompositeBlock()
    corr = radio.BinaryPhaseCorrectorBlock(8000)
    clk_re = radio.ComplexToRealBlock()
    zccr = radio.ZeroCrossingClockRecoveryBlock(1187.5 * 2)
    sampler = radio.SamplerBlock()
    bit_re = radio.ComplexToRealBlock()
    slicer = radio.SlicerBlock()
    man = radio.ManchesterDecoderBlock()
    diff = radio.DifferentialDecoderBlock()
    framer = radio.RDSFramerBlock()
    dec = radio.RDSDecoderBlock()
    sink = CollectSink()
    top.connect(ArraySource(soft.astype(np.complex64), RATE), corr)
    top.connect(corr, clk_re, zccr)
    top.connect(corr, "out", sampler, "data")
    top.connect(zccr, "out", sampler, "clock")
    top.connect(sampler, bit_re, slicer, man, diff, framer, dec, sink)
    top.run(chunk_size=1 << 17)

    raw_found = [tuple(p.data["frame"]) for p in sink.items
                 if p.data.get("type") == "raw"]
    recovered = [g for g in groups if g in raw_found]
    assert len(recovered) >= len(groups) // 2, (len(recovered), len(groups))
