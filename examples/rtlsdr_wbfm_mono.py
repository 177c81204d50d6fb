"""Wideband FM broadcast receiver (mono) from an RTL-SDR, to PulseAudio.

TPU-native analog of /root/reference/examples/rtlsdr_wbfm_mono.lua.
Run: ./luaradio-tpu examples/rtlsdr_wbfm_mono.py
"""

import luaradio_tpu as radio

top = radio.CompositeBlock()
source = radio.RtlSdrSource(88.5e6 - 250e3, 1102500)  # offset-tuned
tuner = radio.TunerBlock(-250e3, 200e3, 5)
demod = radio.WBFMMonoDemodulator()
downsampler = radio.DownsamplerBlock(5)
sink = radio.PulseAudioSink(1)
top.connect(source, tuner, demod, downsampler, sink)

if __name__ == "__main__":
    top.run()
