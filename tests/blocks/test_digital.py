"""Digital symbol block golden tests."""

import numpy as np

from luaradio_tpu import (DifferentialDecoderBlock, ManchesterDecoderBlock,
                          PreambleSamplerBlock, SamplerBlock, SlicerBlock)
from luaradio_tpu.types import Bit, ComplexFloat32, Float32
from tests.jig import check_block, prepare_block, run_block

RNG = np.random.default_rng(5)


def test_slicer():
    x = RNG.standard_normal(1024).astype(np.float32)
    check_block(SlicerBlock, [x], [(x > 0).astype(np.uint8)])


def test_slicer_threshold():
    x = RNG.standard_normal(1024).astype(np.float32)
    check_block(lambda: SlicerBlock(0.5), [x], [(x > 0.5).astype(np.uint8)])


def test_differential_decoder():
    x = RNG.integers(0, 2, 1024).astype(np.uint8)
    prev = np.concatenate([[0], x[:-1]]).astype(np.uint8)
    check_block(DifferentialDecoderBlock, [x], [x ^ prev], input_types=[Bit])
    check_block(lambda: DifferentialDecoderBlock(invert=True), [x],
                [(x ^ prev) ^ 1], input_types=[Bit])


def _sampler_oracle(data, clock):
    hyst = -1.0
    out = []
    for d, c in zip(data, clock):
        if c > 0 and hyst < 0:
            out.append(d)
        if c > 0:
            hyst = 1.0
        elif c < 0:
            hyst = -1.0
    return np.asarray(out)


def test_sampler():
    n = 2048
    data = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
            ).astype(np.complex64)
    # clock: square wave, 8 samples per period
    clock = np.tile(np.concatenate([np.ones(4), -np.ones(4)]), n // 8
                    ).astype(np.float32)
    exp = _sampler_oracle(data, clock)
    blk = prepare_block(SamplerBlock(), [ComplexFloat32, Float32])
    y = run_block(blk, [data, clock], splits=(100, 1000))[0]
    assert np.array_equal(y, exp)


def test_manchester_decoder():
    bits = RNG.integers(0, 2, 256).astype(np.uint8)
    # encode: 0 -> 01, 1 -> 10
    enc = np.zeros(512, dtype=np.uint8)
    enc[0::2] = bits
    enc[1::2] = 1 - bits
    blk = prepare_block(ManchesterDecoderBlock(), [Bit])
    y = run_block(blk, [enc], splits=(33, 100, 217))
    assert np.array_equal(y[0], bits)


def test_manchester_decoder_slip_recovery():
    bits = RNG.integers(0, 2, 128).astype(np.uint8)
    enc = np.zeros(256, dtype=np.uint8)
    enc[0::2] = bits
    enc[1::2] = 1 - bits
    # drop the first chip to force a slip
    blk = prepare_block(ManchesterDecoderBlock(), [Bit])
    y = run_block(blk, [enc[1:]])[0]
    # decoder must resync and produce a suffix of the bit stream
    assert len(y) >= 100
    tail = bits[-len(y):] if len(y) <= len(bits) else bits
    assert np.array_equal(y[-len(tail):], tail)


def test_preamble_sampler():
    rate, baud = 8.0, 1.0
    sp = int(rate / baud)
    preamble = np.array([1, 0, 1, 0, 1, 1, 0, 0, 1, 1, 1, 0, 1, 0, 0, 1],
                        dtype=np.uint8)
    payload_bits = RNG.integers(0, 2, 20)
    frame_bits = np.concatenate([preamble, payload_bits])
    sig = np.repeat(frame_bits * 2.0 - 1.0, sp).astype(np.float32)
    noise_pre = (RNG.standard_normal(257) * 0.1).astype(np.float32)
    noise_post = (RNG.standard_normal(303) * 0.1).astype(np.float32)
    x = np.concatenate([noise_pre, sig, noise_post])
    blk = prepare_block(
        PreambleSamplerBlock(baud, preamble, len(frame_bits)), [Float32],
        rate=rate)
    y = run_block(blk, [x], splits=(100, 300, 500))[0]
    # the first emitted frame must be the real one (spurious matches in the
    # trailing noise may follow, as in the reference: search resumes after
    # each frame)
    assert len(y) >= len(frame_bits)
    got_bits = (y[:len(frame_bits)] > 0).astype(np.uint8)
    assert np.array_equal(got_bits, frame_bits)
