"""Modem block golden tests (translator, discriminator, modulator, PAM/QAM)."""

import numpy as np

from luaradio_tpu import (FrequencyDiscriminatorBlock, FrequencyModulatorBlock,
                          FrequencyTranslatorBlock,
                          PulseAmplitudeModulatorBlock,
                          QuadratureAmplitudeModulatorBlock)
from luaradio_tpu.types import Bit
from tests.jig import check_block

RNG = np.random.default_rng(11)
N = 8192


def cvec(n=N):
    return (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
            ).astype(np.complex64)


def test_frequency_translator():
    x = cvec()
    rate, offset = 2.0, 0.2
    n = np.arange(N, dtype=np.float64)
    exp = x * np.exp(1j * 2 * np.pi * offset / rate * n)
    check_block(lambda: FrequencyTranslatorBlock(offset), [x], [exp],
                epsilon=1e-4)


def test_frequency_translator_long_stream_phase_accuracy():
    """Phase error must stay bounded over millions of samples (the float32
    recurrence the reference uses resets the rotator every 512 samples for
    the same reason — frequencytranslator.lua:45-52)."""
    n_total = 1 << 21
    x = np.ones(n_total, dtype=np.complex64)
    rate, offset = 2.0, 0.123456
    n = np.arange(n_total, dtype=np.float64)
    exp = np.exp(1j * np.mod(2 * np.pi * offset / rate * n, 2 * np.pi))
    check_block(lambda: FrequencyTranslatorBlock(offset), [x], [exp],
                epsilon=5e-4, splits=(1 << 18, 1 << 19, 1 << 20))


def test_frequency_discriminator():
    x = cvec()
    k = 1.25
    prev = np.concatenate([[0j], x[:-1]])
    exp = np.angle(x * np.conj(prev)) / (2 * np.pi * k)
    check_block(lambda: FrequencyDiscriminatorBlock(k), [x], [exp],
                epsilon=1e-5)


def test_frequency_modulator():
    x = RNG.standard_normal(N).astype(np.float32) * 0.5
    k = 0.1
    phi = np.cumsum(2 * np.pi * k * x.astype(np.float64))
    exp = np.exp(1j * phi)
    check_block(lambda: FrequencyModulatorBlock(k), [x], [exp], epsilon=1e-3)


def test_fm_mod_demod_roundtrip():
    msg = np.sin(2 * np.pi * 0.01 * np.arange(N)).astype(np.float32)
    k = 0.2
    from tests.jig import prepare_block, run_block
    from luaradio_tpu.types import ComplexFloat32, Float32
    mod = prepare_block(FrequencyModulatorBlock(k), [Float32])
    x = run_block(mod, [msg])[0]
    demod = prepare_block(FrequencyDiscriminatorBlock(k), [ComplexFloat32])
    y = run_block(demod, [x.astype(np.complex64)], splits=(1000, 4000))[0]
    # phi[n]-phi[n-1] = 2*pi*k*msg[n], so y[n] recovers msg[n] directly
    assert np.max(np.abs(y[1:] - msg[1:])) < 1e-2


def test_pam_2level():
    bits = RNG.integers(0, 2, 256).astype(np.uint8)
    blk = lambda: PulseAmplitudeModulatorBlock(
        symbol_rate=1.0, sample_rate=4.0, levels=2)
    sym = (2.0 * bits - 1.0) / np.sqrt(1.0)  # scaling sqrt((4-1)/3)=1
    exp = np.repeat(sym, 4).astype(np.float32)
    check_block(blk, [bits], [exp], input_types=[Bit], rate=4.0,
                splits=(16, 33, 100))


def test_qam_4point_unit_energy():
    bits = RNG.integers(0, 2, 512).astype(np.uint8)
    blk = QuadratureAmplitudeModulatorBlock(1.0, 2.0, 4)
    from tests.jig import prepare_block, run_block
    prepare_block(blk, [Bit], rate=2.0)
    y = run_block(blk, [bits])[0]
    assert y.shape[-1] == 512  # 2 bits/symbol * 2 samples/symbol
    assert np.allclose(np.abs(y), 1.0, atol=1e-5)  # unit-energy points
    assert len(np.unique(np.round(y, 4))) == 4
