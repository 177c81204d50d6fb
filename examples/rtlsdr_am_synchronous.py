"""AM broadcast receiver (synchronous detection: carrier PLL + mixer).

TPU-native analog of /root/reference/examples/rtlsdr_am_synchronous.lua.
Run: ./luaradio-tpu examples/rtlsdr_am_synchronous.py <frequency>
"""

import os
import sys

import luaradio_tpu as radio

frequency = float(sys.argv[1]) if len(sys.argv) > 1 else 1030e3
ifreq = 50e3
bandwidth = 5e3

top = radio.CompositeBlock()
source = radio.RtlSdrSource(frequency - ifreq, 1102500)
rf_decimator = radio.DecimatorBlock(5)
if_filter = radio.ComplexBandpassFilterBlock(
    129, (ifreq - bandwidth, ifreq + bandwidth))
pll = radio.PLLBlock(1000, ifreq - 100, ifreq + 100)
mixer = radio.MultiplyConjugateBlock()
am_demod = radio.ComplexToRealBlock()
dcr_filter = radio.SinglepoleHighpassFilterBlock(100)
af_filter = radio.LowpassFilterBlock(128, bandwidth)
af_downsampler = radio.DownsamplerBlock(10)
af_gain = radio.AGCBlock("slow")
sink = (radio.PulseAudioSink(1) if os.environ.get("DISPLAY")
        else radio.WAVFileSink("am.wav", 1))

top.connect(source, rf_decimator, if_filter)
top.connect(if_filter, "out", mixer, "in1")
top.connect(if_filter, pll)
top.connect(pll, "out", mixer, "in2")
top.connect(mixer, am_demod, dcr_filter, af_filter, af_downsampler,
            af_gain, sink)

if __name__ == "__main__":
    top.run()
