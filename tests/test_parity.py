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
