"""Reference-surface parity test: every public component of the reference
(SURVEY.md §2) must exist in the luaradio_tpu namespace."""

import luaradio_tpu as radio

SIGNAL_BLOCKS = [
    # filtering
    "FIRFilterBlock", "IIRFilterBlock", "LowpassFilterBlock",
    "HighpassFilterBlock", "BandpassFilterBlock", "BandstopFilterBlock",
    "ComplexBandpassFilterBlock", "ComplexBandstopFilterBlock",
    "RootRaisedCosineFilterBlock", "PulseMatchedFilterBlock",
    "ManchesterMatchedFilterBlock", "SinglepoleLowpassFilterBlock",
    "SinglepoleHighpassFilterBlock", "FMDeemphasisFilterBlock",
    "FMPreemphasisFilterBlock", "HilbertTransformBlock",
    # modem
    "FrequencyTranslatorBlock", "FrequencyDiscriminatorBlock",
    "FrequencyModulatorBlock", "PulseAmplitudeModulatorBlock",
    "QuadratureAmplitudeModulatorBlock",
    # carrier / level
    "PLLBlock", "AGCBlock", "PowerSquelchBlock",
    "ZeroCrossingClockRecoveryBlock", "BinaryPhaseCorrectorBlock",
    # digital
    "SamplerBlock", "SlicerBlock", "DifferentialDecoderBlock",
    "ManchesterDecoderBlock", "PreambleSamplerBlock",
    # elementwise
    "AddBlock", "SubtractBlock", "MultiplyBlock", "MultiplyConjugateBlock",
    "MultiplyConstantBlock", "AddConstantBlock", "AbsoluteValueBlock",
    "ComplexConjugateBlock", "ComplexMagnitudeBlock", "ComplexPhaseBlock",
    "ComplexToRealBlock", "ComplexToImagBlock", "ComplexToFloatBlock",
    "RealToComplexBlock", "FloatToComplexBlock",
    # plumbing
    "DownsamplerBlock", "UpsamplerBlock", "DelayBlock", "InterleaveBlock",
    "DeinterleaveBlock", "NopBlock", "ThrottleBlock",
]

PROTOCOL_BLOCKS = [
    "RDSFramerBlock", "RDSDecoderBlock", "AX25FramerBlock",
    "POCSAGFramerBlock", "POCSAGDecoderBlock", "IDMFramerBlock",
    "SCMFramerBlock", "SCMPlusFramerBlock", "VaricodeDecoderBlock",
]

SOURCES = [
    "ZeroSource", "NullSource", "SignalSource", "UniformRandomSource",
    "IQFileSource", "RealFileSource", "RawFileSource", "WAVFileSource",
    "JSONSource", "NetworkClientSource", "NetworkServerSource",
    "RtlSdrSource", "AirspySource", "AirspyHFSource", "HackRFSource",
    "HydraSDRSource", "SDRplaySource", "BladeRFSource", "UHDSource",
    "SoapySDRSource", "PulseAudioSource", "PortAudioSource",
]

SINKS = [
    "IQFileSink", "RealFileSink", "RawFileSink", "WAVFileSink", "PrintSink",
    "JSONSink", "NopSink", "BenchmarkSink", "PulseAudioSink", "PortAudioSink",
    "GnuplotPlotSink", "GnuplotXYPlotSink", "GnuplotSpectrumSink",
    "GnuplotWaterfallSink", "NetworkClientSink", "NetworkServerSink",
    "SoapySDRSink", "HackRFSink", "UHDSink", "BladeRFSink",
]

COMPOSITES = [
    "TunerBlock", "DecimatorBlock", "InterpolatorBlock",
    "RationalResamplerBlock", "WBFMMonoDemodulator", "WBFMStereoDemodulator",
    "NBFMDemodulator", "AMEnvelopeDemodulator", "AMSynchronousDemodulator",
    "SSBDemodulator", "SSBModulator", "RDSReceiver", "AX25Receiver",
    "POCSAGReceiver", "ERTReceiver", "BPSK31Receiver",
]

TYPES = ["ComplexFloat32", "Float32", "Bit", "Byte"]

CORE = ["CompositeBlock", "Block", "Input", "Output"]


def test_signal_block_parity():
    missing = [n for n in SIGNAL_BLOCKS if not hasattr(radio, n)]
    assert not missing, f"missing signal blocks: {missing}"


def test_protocol_block_parity():
    missing = [n for n in PROTOCOL_BLOCKS if not hasattr(radio, n)]
    assert not missing, f"missing protocol blocks: {missing}"


def test_source_parity():
    missing = [n for n in SOURCES if not hasattr(radio, n)]
    assert not missing, f"missing sources: {missing}"


def test_sink_parity():
    missing = [n for n in SINKS if not hasattr(radio, n)]
    assert not missing, f"missing sinks: {missing}"


def test_composite_parity():
    missing = [n for n in COMPOSITES if not hasattr(radio, n)]
    assert not missing, f"missing composites: {missing}"


def test_type_and_core_parity():
    missing = [n for n in TYPES + CORE if not hasattr(radio, n)]
    assert not missing, f"missing: {missing}"


def test_application_parity():
    from luaradio_tpu.applications import APPLICATIONS
    assert set(APPLICATIONS) == {
        "rx_raw", "rx_wbfm", "rx_nbfm", "rx_am", "rx_ssb", "rx_rds",
        "rx_ax25", "rx_pocsag", "rx_ert", "iq_converter"}


def test_utility_parity():
    from luaradio_tpu.utils import (filter_design, format, math, network,
                                    spectrum, window)
    for name in ("firwin_lowpass", "firwin_highpass", "firwin_bandpass",
                 "firwin_bandstop", "firwin_complex_bandpass",
                 "firwin_complex_bandstop", "fir_root_raised_cosine",
                 "fir_hilbert_transform"):
        assert hasattr(filter_design, name)
    assert len(format.FORMATS) == 14
    for name in ("dft", "idft", "fftshift", "PSD"):
        assert hasattr(spectrum, name)
    assert hasattr(network, "NetworkClient")
    assert hasattr(network, "NetworkServer")
    assert hasattr(math, "ceil_log2")
    assert hasattr(window, "window")


# ---------------------------------------------------------------------------
# Behavior smokes: every listed block must instantiate, differentiate, and
# process one chunk (presence tests would not catch a regression to a stub —
# round-1 shipped 4.5 kLoC of stubs that passed the hasattr checks above).
# ---------------------------------------------------------------------------

import io

import numpy as np
import pytest

from luaradio_tpu.types import Bit, Byte, ComplexFloat32, Float32
from tests.jig import prepare_block, run_block

_RNG = np.random.default_rng(5)
_N = 4096


def _c64(n=_N):
    return (_RNG.standard_normal(n) + 1j * _RNG.standard_normal(n)
            ).astype(np.complex64) * 0.5


def _f32(n=_N):
    return _RNG.standard_normal(n).astype(np.float32)


def _bits(n=_N):
    return _RNG.integers(0, 2, n).astype(np.uint8)


# name -> (ctor, input_types, input arrays); rate fixed at 48e3
_SIGNAL_SMOKES = {
    "FIRFilterBlock": (lambda: radio.FIRFilterBlock(_f32(9)),
                       [ComplexFloat32], [_c64()]),
    "IIRFilterBlock": (lambda: radio.IIRFilterBlock([0.3, 0.3], [1.0, -0.4]),
                       [Float32], [_f32()]),
    "LowpassFilterBlock": (lambda: radio.LowpassFilterBlock(33, 8e3),
                           [Float32], [_f32()]),
    "HighpassFilterBlock": (lambda: radio.HighpassFilterBlock(33, 8e3),
                            [Float32], [_f32()]),
    "BandpassFilterBlock": (lambda: radio.BandpassFilterBlock(33, (4e3, 8e3)),
                            [Float32], [_f32()]),
    "BandstopFilterBlock": (lambda: radio.BandstopFilterBlock(33, (4e3, 8e3)),
                            [Float32], [_f32()]),
    "ComplexBandpassFilterBlock": (
        lambda: radio.ComplexBandpassFilterBlock(33, (4e3, 8e3)),
        [ComplexFloat32], [_c64()]),
    "ComplexBandstopFilterBlock": (
        lambda: radio.ComplexBandstopFilterBlock(33, (4e3, 8e3)),
        [ComplexFloat32], [_c64()]),
    "RootRaisedCosineFilterBlock": (
        lambda: radio.RootRaisedCosineFilterBlock(33, 0.5, 1200),
        [Float32], [_f32()]),
    "PulseMatchedFilterBlock": (lambda: radio.PulseMatchedFilterBlock(1200),
                                [Float32], [_f32()]),
    "ManchesterMatchedFilterBlock": (
        lambda: radio.ManchesterMatchedFilterBlock(1200),
        [Float32], [_f32()]),
    "SinglepoleLowpassFilterBlock": (
        lambda: radio.SinglepoleLowpassFilterBlock(4e3),
        [Float32], [_f32()]),
    "SinglepoleHighpassFilterBlock": (
        lambda: radio.SinglepoleHighpassFilterBlock(4e3),
        [Float32], [_f32()]),
    "FMDeemphasisFilterBlock": (lambda: radio.FMDeemphasisFilterBlock(75e-6),
                                [Float32], [_f32()]),
    "FMPreemphasisFilterBlock": (lambda: radio.FMPreemphasisFilterBlock(75e-6),
                                 [Float32], [_f32()]),
    "HilbertTransformBlock": (lambda: radio.HilbertTransformBlock(33),
                              [Float32], [_f32()]),
    "FrequencyTranslatorBlock": (lambda: radio.FrequencyTranslatorBlock(5e3),
                                 [ComplexFloat32], [_c64()]),
    "FrequencyDiscriminatorBlock": (
        lambda: radio.FrequencyDiscriminatorBlock(1.25),
        [ComplexFloat32], [_c64()]),
    "FrequencyModulatorBlock": (lambda: radio.FrequencyModulatorBlock(0.1),
                                [Float32], [_f32()]),
    "PulseAmplitudeModulatorBlock": (
        lambda: radio.PulseAmplitudeModulatorBlock(1200, 48e3, 4),
        [Bit], [_bits()]),
    "QuadratureAmplitudeModulatorBlock": (
        lambda: radio.QuadratureAmplitudeModulatorBlock(1200, 48e3, 4),
        [Bit], [_bits()]),
    "PLLBlock": (lambda: radio.PLLBlock(100.0, 1e3, 2e3),
                 [ComplexFloat32], [_c64()]),
    "AGCBlock": (lambda: radio.AGCBlock("fast"),
                 [ComplexFloat32], [_c64()]),
    "PowerSquelchBlock": (lambda: radio.PowerSquelchBlock(-40.0),
                          [Float32], [_f32()]),
    "ZeroCrossingClockRecoveryBlock": (
        lambda: radio.ZeroCrossingClockRecoveryBlock(1200),
        [Float32], [_f32()]),
    "BinaryPhaseCorrectorBlock": (
        lambda: radio.BinaryPhaseCorrectorBlock(32),
        [ComplexFloat32], [_c64()]),
    "SamplerBlock": (lambda: radio.SamplerBlock(),
                     [Float32, Float32],
                     [_f32(), np.sign(_f32()).astype(np.float32)]),
    "SlicerBlock": (lambda: radio.SlicerBlock(), [Float32], [_f32()]),
    "DifferentialDecoderBlock": (lambda: radio.DifferentialDecoderBlock(),
                                 [Bit], [_bits()]),
    "ManchesterDecoderBlock": (lambda: radio.ManchesterDecoderBlock(),
                               [Bit], [_bits()]),
    "PreambleSamplerBlock": (
        lambda: radio.PreambleSamplerBlock(1200, [1, 0, 1, 0, 1, 0, 1, 0],
                                           32),
        [Float32], [_f32()]),
    "AddBlock": (lambda: radio.AddBlock(),
                 [Float32, Float32], [_f32(), _f32()]),
    "SubtractBlock": (lambda: radio.SubtractBlock(),
                      [Float32, Float32], [_f32(), _f32()]),
    "MultiplyBlock": (lambda: radio.MultiplyBlock(),
                      [Float32, Float32], [_f32(), _f32()]),
    "MultiplyConjugateBlock": (lambda: radio.MultiplyConjugateBlock(),
                               [ComplexFloat32, ComplexFloat32],
                               [_c64(), _c64()]),
    "MultiplyConstantBlock": (lambda: radio.MultiplyConstantBlock(2.5),
                              [Float32], [_f32()]),
    "AddConstantBlock": (lambda: radio.AddConstantBlock(1.5),
                         [Float32], [_f32()]),
    "AbsoluteValueBlock": (lambda: radio.AbsoluteValueBlock(),
                           [Float32], [_f32()]),
    "ComplexConjugateBlock": (lambda: radio.ComplexConjugateBlock(),
                              [ComplexFloat32], [_c64()]),
    "ComplexMagnitudeBlock": (lambda: radio.ComplexMagnitudeBlock(),
                              [ComplexFloat32], [_c64()]),
    "ComplexPhaseBlock": (lambda: radio.ComplexPhaseBlock(),
                          [ComplexFloat32], [_c64()]),
    "ComplexToRealBlock": (lambda: radio.ComplexToRealBlock(),
                           [ComplexFloat32], [_c64()]),
    "ComplexToImagBlock": (lambda: radio.ComplexToImagBlock(),
                           [ComplexFloat32], [_c64()]),
    "ComplexToFloatBlock": (lambda: radio.ComplexToFloatBlock(),
                            [ComplexFloat32], [_c64()]),
    "RealToComplexBlock": (lambda: radio.RealToComplexBlock(),
                           [Float32], [_f32()]),
    "FloatToComplexBlock": (lambda: radio.FloatToComplexBlock(),
                            [Float32, Float32], [_f32(), _f32()]),
    "DownsamplerBlock": (lambda: radio.DownsamplerBlock(4),
                         [Float32], [_f32()]),
    "UpsamplerBlock": (lambda: radio.UpsamplerBlock(3),
                       [Float32], [_f32()]),
    "DelayBlock": (lambda: radio.DelayBlock(17), [Float32], [_f32()]),
    "InterleaveBlock": (lambda: radio.InterleaveBlock(2),
                        [Float32, Float32], [_f32(), _f32()]),
    "DeinterleaveBlock": (lambda: radio.DeinterleaveBlock(2),
                          [Float32], [_f32()]),
    "NopBlock": (lambda: radio.NopBlock(), [Float32], [_f32()]),
    "ThrottleBlock": (lambda: radio.ThrottleBlock(1e9),
                      [Float32], [_f32()]),
}


@pytest.mark.parametrize("name", SIGNAL_BLOCKS)
def test_signal_block_behaves(name):
    """One-chunk smoke: the block differentiates, initializes, and emits
    output of the declared port count (a stub would fail here)."""
    ctor, in_types, ins = _SIGNAL_SMOKES[name]
    blk = prepare_block(ctor(), in_types, rate=48e3)
    outs = run_block(blk, ins)
    assert len(outs) == len(blk.outputs)
    if not getattr(blk, "masked_output", False) and blk.outputs:
        assert sum(np.size(o) for o in outs) > 0, name


@pytest.mark.parametrize("name", PROTOCOL_BLOCKS)
def test_protocol_block_behaves(name):
    """Framers/decoders must consume a random stream without error (their
    exact decode paths are covered by tests/blocks/test_protocol.py)."""
    if name in ("RDSDecoderBlock", "POCSAGDecoderBlock"):
        pytest.skip("decoders consume framed objects; covered by "
                    "tests/blocks/test_protocol.py")
    ctor = getattr(radio, name)
    blk = ctor()
    in_t = blk.signatures[0].inputs[0].accepted
    if callable(in_t) and not isinstance(in_t, type(Bit)):
        in_t = Bit
    if isinstance(in_t, (tuple, list, set)):
        in_t = list(in_t)[0]
    blk.differentiate([in_t if in_t in (Bit, Byte, Float32, ComplexFloat32)
                       else Bit])
    blk.input_rate = 48e3
    blk.initialize()
    if in_t == Float32:
        data = _f32()
    elif in_t == ComplexFloat32:
        data = _c64()
    else:
        data = _bits()
    out = blk.process(data)
    assert out is None or isinstance(out, (list, tuple, np.ndarray))


@pytest.mark.parametrize("name", COMPOSITES)
def test_composite_builds_and_plans(name):
    """Each composite must flatten, differentiate, rate-check, and chunk-
    plan inside a real graph (catches wiring/rate regressions without the
    cost of a full decode run — those live in tests/core/)."""
    from luaradio_tpu.core.runtime import Runner

    args = {
        "TunerBlock": (50e3, 100e3, 2),
        "DecimatorBlock": (4,),
        "InterpolatorBlock": (3,),
        "RationalResamplerBlock": (3, 2),
        "AMSynchronousDemodulator": (10e3,),
        "SSBDemodulator": ("usb",),
        "SSBModulator": ("usb",),
    }.get(name, ())
    ctor = getattr(radio, name)
    comp = ctor(*args)
    in_t = comp.signatures[0].inputs[0].accepted if comp.inputs else None
    top = radio.CompositeBlock()
    rate = 240e3
    if name == "AX25Receiver":
        rate = 22050.0
    elif name == "POCSAGReceiver":
        rate = 38400.0
    elif name == "BPSK31Receiver":
        rate = 8000.0
    if in_t == Float32:
        src = radio.UniformRandomSource(Float32, rate)
    else:
        src = radio.UniformRandomSource(ComplexFloat32, rate)
    sinks = [radio.NopSink() for _ in range(max(1, len(comp.outputs)))]
    top.connect(src, comp)
    for i, s in enumerate(sinks[:max(1, len(comp.outputs))]):
        if len(comp.outputs) > 1:
            top.connect(comp, comp.outputs[i].name, s, "in")
        else:
            top.connect(comp, s)
    runner = Runner(top, mode="fused", chunk_size=1 << 14)
    assert runner.graph.order, name
