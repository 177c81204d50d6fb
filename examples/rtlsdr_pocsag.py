"""POCSAG pager receiver from an RTL-SDR, to JSON.

TPU-native analog of /root/reference/examples/rtlsdr_pocsag.lua.
Run: ./luaradio-tpu examples/rtlsdr_pocsag.py <frequency>
"""

import sys

import luaradio_tpu as radio

frequency = float(sys.argv[1]) if len(sys.argv) > 1 else 152.24e6
tune_offset = -100e3
baudrate = 1200

top = radio.CompositeBlock()
source = radio.RtlSdrSource(frequency + tune_offset, 1000000)
tuner = radio.TunerBlock(tune_offset, 12e3, 80)
space_filter = radio.ComplexBandpassFilterBlock(129, (3500, 5500))
space_magnitude = radio.ComplexMagnitudeBlock()
mark_filter = radio.ComplexBandpassFilterBlock(129, (-5500, -3500))
mark_magnitude = radio.ComplexMagnitudeBlock()
subtractor = radio.SubtractBlock()
data_filter = radio.LowpassFilterBlock(128, baudrate)
clock_recoverer = radio.ZeroCrossingClockRecoveryBlock(baudrate)
sampler = radio.SamplerBlock()
bit_slicer = radio.SlicerBlock()
framer = radio.POCSAGFramerBlock()
decoder = radio.POCSAGDecoderBlock()
sink = radio.JSONSink()

top.connect(source, tuner)
top.connect(tuner, space_filter, space_magnitude)
top.connect(tuner, mark_filter, mark_magnitude)
top.connect(mark_magnitude, "out", subtractor, "in1")
top.connect(space_magnitude, "out", subtractor, "in2")
top.connect(subtractor, data_filter)
top.connect(data_filter, clock_recoverer)
top.connect(data_filter, "out", sampler, "data")
top.connect(clock_recoverer, "out", sampler, "clock")
top.connect(sampler, bit_slicer, framer, decoder, sink)

if __name__ == "__main__":
    top.run()
