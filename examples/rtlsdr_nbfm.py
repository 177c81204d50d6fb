"""Narrowband FM receiver from an RTL-SDR, to audio/WAV.

TPU-native analog of /root/reference/examples/rtlsdr_nbfm.lua.
Run: ./luaradio-tpu examples/rtlsdr_nbfm.py <frequency>
"""

import os
import sys

import luaradio_tpu as radio

frequency = float(sys.argv[1]) if len(sys.argv) > 1 else 162.55e6
tune_offset = -100e3
deviation, bandwidth = 5e3, 4e3

top = radio.CompositeBlock()
source = radio.RtlSdrSource(frequency + tune_offset, 1102500)
tuner = radio.TunerBlock(tune_offset, 2 * (deviation + bandwidth), 50)
fm_demod = radio.FrequencyDiscriminatorBlock(deviation / bandwidth)
af_filter = radio.LowpassFilterBlock(128, bandwidth)
sink = (radio.PulseAudioSink(1) if os.environ.get("DISPLAY")
        else radio.WAVFileSink("nbfm.wav", 1))
top.connect(source, tuner, fm_demod, af_filter, sink)

if __name__ == "__main__":
    top.run()
