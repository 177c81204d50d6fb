"""SSB receiver from an RTL-SDR.

TPU-native analog of /root/reference/examples/rtlsdr_ssb.lua.
Run: ./luaradio-tpu examples/rtlsdr_ssb.py <frequency> <usb|lsb>
"""

import os
import sys

import luaradio_tpu as radio

frequency = float(sys.argv[1]) if len(sys.argv) > 1 else 14.2e6
sideband = sys.argv[2] if len(sys.argv) > 2 else "usb"
tune_offset = -100e3
bandwidth = 3e3

top = radio.CompositeBlock()
source = radio.RtlSdrSource(frequency + tune_offset, 1102500)
tuner = radio.TunerBlock(tune_offset, 2 * bandwidth, 50)
sb_filter = radio.ComplexBandpassFilterBlock(
    129, (0, -bandwidth) if sideband == "lsb" else (0, bandwidth))
am_demod = radio.ComplexToRealBlock()
af_filter = radio.LowpassFilterBlock(128, bandwidth)
af_gain = radio.AGCBlock("fast")
sink = (radio.PulseAudioSink(1) if os.environ.get("DISPLAY")
        else radio.WAVFileSink("ssb.wav", 1))
top.connect(source, tuner, sb_filter, am_demod, af_filter, af_gain, sink)

if __name__ == "__main__":
    top.run()
