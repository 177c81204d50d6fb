"""Wideband FM broadcast receiver (stereo) from an RTL-SDR.

TPU-native analog of /root/reference/examples/rtlsdr_wbfm_stereo.lua,
using the WBFMStereoDemodulator composite with the TPU-native vectorized
pilot recovery (see blocks/signal/carrier.py PilotRecoveryBlock; pass
pilot="pll" for the reference's PLL pilot path).
Run: ./luaradio-tpu examples/rtlsdr_wbfm_stereo.py <frequency>
"""

import os
import sys

import luaradio_tpu as radio

frequency = float(sys.argv[1]) if len(sys.argv) > 1 else 88.5e6
tune_offset = -250e3

top = radio.CompositeBlock()
source = radio.RtlSdrSource(frequency + tune_offset, 1102500)
tuner = radio.TunerBlock(tune_offset, 200e3, 5)
demod = radio.WBFMStereoDemodulator(pilot="vector")
l_downsampler = radio.DownsamplerBlock(5)
r_downsampler = radio.DownsamplerBlock(5)
sink = (radio.PulseAudioSink(2) if os.environ.get("DISPLAY")
        else radio.WAVFileSink("wbfm_stereo.wav", 2))

top.connect(source, tuner, demod)
top.connect(demod, "left", l_downsampler, "in")
top.connect(demod, "right", r_downsampler, "in")
top.connect(l_downsampler, "out", sink, "in1")
top.connect(r_downsampler, "out", sink, "in2")

if __name__ == "__main__":
    top.run()
