"""Wideband FM broadcast receiver (stereo) from an IQ capture file, to WAV.

TPU-native analog of /root/reference/examples/rtlsdr_wbfm_stereo.lua using a
recorded capture instead of hardware.
Run: ./luaradio-tpu examples/iqfile_wbfm_stereo.py capture.iq out.wav
"""

import sys

import luaradio_tpu as radio

capture = sys.argv[1] if len(sys.argv) > 1 else "capture.iq"
out = sys.argv[2] if len(sys.argv) > 2 else "out.wav"

top = radio.CompositeBlock()
source = radio.IQFileSource(capture, "f32le", 1102500)
tuner = radio.TunerBlock(-250e3, 200e3, 5)
demod = radio.WBFMStereoDemodulator()
l_downsampler = radio.DownsamplerBlock(5)
r_downsampler = radio.DownsamplerBlock(5)
sink = radio.WAVFileSink(out, 2)
top.connect(source, tuner, demod)
top.connect(demod, "left", l_downsampler, "in")
top.connect(demod, "right", r_downsampler, "in")
top.connect(l_downsampler, "out", sink, "in1")
top.connect(r_downsampler, "out", sink, "in2")

if __name__ == "__main__":
    top.run()
