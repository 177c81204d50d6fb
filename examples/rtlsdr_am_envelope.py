"""AM broadcast receiver (envelope detection) from an RTL-SDR.

TPU-native analog of /root/reference/examples/rtlsdr_am_envelope.lua.
Run: ./luaradio-tpu examples/rtlsdr_am_envelope.py <frequency>
"""

import os
import sys

import luaradio_tpu as radio

frequency = float(sys.argv[1]) if len(sys.argv) > 1 else 1030e3
tune_offset = -100e3
bandwidth = 5e3

top = radio.CompositeBlock()
source = radio.RtlSdrSource(frequency + tune_offset, 1102500)
tuner = radio.TunerBlock(tune_offset, 2 * bandwidth, 50)
am_demod = radio.ComplexMagnitudeBlock()
dcr_filter = radio.SinglepoleHighpassFilterBlock(100)
af_filter = radio.LowpassFilterBlock(128, bandwidth)
af_gain = radio.AGCBlock("slow")
sink = (radio.PulseAudioSink(1) if os.environ.get("DISPLAY")
        else radio.WAVFileSink("am.wav", 1))
top.connect(source, tuner, am_demod, dcr_filter, af_filter, af_gain, sink)

if __name__ == "__main__":
    top.run()
