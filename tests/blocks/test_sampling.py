"""Sampling / plumbing block golden tests."""

import numpy as np

from luaradio_tpu import (DeinterleaveBlock, DelayBlock, DownsamplerBlock,
                          InterleaveBlock, UpsamplerBlock)
from luaradio_tpu.types import ComplexFloat32, Float32
from tests.jig import check_block

RNG = np.random.default_rng(3)
N = 4096


def cvec(n=N):
    return (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
            ).astype(np.complex64)


def test_downsampler():
    x = cvec()
    for m in (2, 5, 7):
        # jig splits must be multiples of m; check_block aligns them
        check_block(lambda: DownsamplerBlock(m), [x[:N // m * m]],
                    [x[:N // m * m][::m]])


def test_upsampler():
    x = cvec(512)
    for l in (2, 3):
        exp = np.zeros(512 * l, dtype=np.complex64)
        exp[::l] = x
        check_block(lambda: UpsamplerBlock(l), [x], [exp])


def test_delay():
    x = cvec()
    d = 300
    exp = np.concatenate([np.zeros(d, dtype=np.complex64), x[:-d]])
    check_block(lambda: DelayBlock(d), [x], [exp])


def test_delay_bits():
    x = RNG.integers(0, 2, 1024).astype(np.uint8)
    d = 17
    exp = np.concatenate([np.zeros(d, dtype=np.uint8), x[:-d]])
    from luaradio_tpu.types import Bit
    check_block(lambda: DelayBlock(d), [x], [exp], input_types=[Bit])


def test_interleave_deinterleave():
    a, b = cvec(512), cvec(512)
    inter = np.empty(1024, dtype=np.complex64)
    inter[0::2], inter[1::2] = a, b
    check_block(lambda: InterleaveBlock(2), [a, b], [inter])
    check_block(lambda: DeinterleaveBlock(2), [inter], [a, b])
