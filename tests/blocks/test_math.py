"""Elementwise math block golden tests (numpy oracles; the reference's specs
are generated from numpy too — tests/blocks/signal/*_spec.py)."""

import numpy as np
import pytest

from luaradio_tpu import (AbsoluteValueBlock, AddBlock, AddConstantBlock,
                          ComplexConjugateBlock, ComplexMagnitudeBlock,
                          ComplexPhaseBlock, ComplexToFloatBlock,
                          ComplexToImagBlock, ComplexToRealBlock,
                          FloatToComplexBlock, MultiplyBlock,
                          MultiplyConjugateBlock, MultiplyConstantBlock,
                          RealToComplexBlock, SubtractBlock)
from tests.jig import check_block

RNG = np.random.default_rng(1)
N = 4096


def cvec(n=N):
    return (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
            ).astype(np.complex64)


def fvec(n=N):
    return RNG.standard_normal(n).astype(np.float32)


def test_add_complex():
    a, b = cvec(), cvec()
    check_block(AddBlock, [a, b], [a + b])


def test_add_real():
    a, b = fvec(), fvec()
    check_block(AddBlock, [a, b], [a + b])


def test_subtract():
    a, b = cvec(), cvec()
    check_block(SubtractBlock, [a, b], [a - b])


def test_multiply():
    a, b = cvec(), cvec()
    check_block(MultiplyBlock, [a, b], [a * b], epsilon=1e-5)


def test_multiply_conjugate():
    a, b = cvec(), cvec()
    check_block(MultiplyConjugateBlock, [a, b], [a * np.conj(b)], epsilon=1e-5)


@pytest.mark.parametrize("const", [2.5, -0.5 + 1.25j])
def test_multiply_constant(const):
    a = cvec()
    check_block(lambda: MultiplyConstantBlock(const), [a],
                [(a * np.complex64(const)).astype(np.complex64)], epsilon=1e-5)


def test_add_constant_real():
    a = fvec()
    check_block(lambda: AddConstantBlock(1.5), [a], [a + np.float32(1.5)])


def test_absolute_value():
    a = fvec()
    check_block(AbsoluteValueBlock, [a], [np.abs(a)])


def test_complex_conjugate():
    a = cvec()
    check_block(ComplexConjugateBlock, [a], [np.conj(a)])


def test_complex_magnitude():
    a = cvec()
    check_block(ComplexMagnitudeBlock, [a], [np.abs(a)], epsilon=1e-5)


def test_complex_phase():
    a = cvec()
    check_block(ComplexPhaseBlock, [a], [np.angle(a)], epsilon=1e-5)


def test_complex_to_real_imag():
    a = cvec()
    check_block(ComplexToRealBlock, [a], [a.real])
    check_block(ComplexToImagBlock, [a], [a.imag])


def test_complex_to_float():
    a = cvec()
    check_block(ComplexToFloatBlock, [a], [a.real, a.imag])


def test_real_to_complex():
    a = fvec()
    check_block(RealToComplexBlock, [a], [a.astype(np.complex64)])


def test_float_to_complex():
    re, im = fvec(), fvec()
    check_block(FloatToComplexBlock, [re, im],
                [(re + 1j * im).astype(np.complex64)])
