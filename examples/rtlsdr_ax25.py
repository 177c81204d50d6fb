"""AX.25 packet radio receiver (1200 baud AFSK) from an RTL-SDR, to JSON.

TPU-native analog of /root/reference/examples/rtlsdr_ax25.lua.
Run: ./luaradio-tpu examples/rtlsdr_ax25.py <frequency>
"""

import sys

import luaradio_tpu as radio

frequency = float(sys.argv[1]) if len(sys.argv) > 1 else 144.39e6
tune_offset = -100e3
baudrate = 1200

top = radio.CompositeBlock()
source = radio.RtlSdrSource(frequency + tune_offset, 1000000)
tuner = radio.TunerBlock(tune_offset, 12e3, 80)
nbfm_demod = radio.NBFMDemodulator(3e3, 3e3)
hilbert = radio.HilbertTransformBlock(129)
translator = radio.FrequencyTranslatorBlock(-1700)
afsk_filter = radio.LowpassFilterBlock(128, 750)
afsk_demod = radio.FrequencyDiscriminatorBlock(1.25)
data_filter = radio.LowpassFilterBlock(128, baudrate)
clock_recoverer = radio.ZeroCrossingClockRecoveryBlock(baudrate)
sampler = radio.SamplerBlock()
bit_slicer = radio.SlicerBlock()
bit_decoder = radio.DifferentialDecoderBlock(invert=True)
framer = radio.AX25FramerBlock()
sink = radio.JSONSink()

top.connect(source, tuner, nbfm_demod, hilbert, translator, afsk_filter,
            afsk_demod, data_filter)
top.connect(data_filter, clock_recoverer)
top.connect(data_filter, "out", sampler, "data")
top.connect(clock_recoverer, "out", sampler, "clock")
top.connect(sampler, bit_slicer, bit_decoder, framer, sink)

if __name__ == "__main__":
    top.run()
