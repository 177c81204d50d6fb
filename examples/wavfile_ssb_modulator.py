"""SSB modulator: WAV file in, f32le IQ file out.

TPU-native analog of /root/reference/examples/wavfile_ssb_modulator.lua.
Run: ./luaradio-tpu examples/wavfile_ssb_modulator.py \
         <wav in> <iq out> <bandwidth> <usb|lsb>
"""

import sys

import luaradio_tpu as radio

if len(sys.argv) < 5:
    sys.exit(f"Usage: {sys.argv[0]} <WAV in> <IQ f32le out> "
             f"<bandwidth> <usb|lsb>")
wav_path, iq_path = sys.argv[1], sys.argv[2]
bandwidth = float(sys.argv[3])
sideband = sys.argv[4]
assert sideband in ("usb", "lsb")

top = radio.CompositeBlock()
source = radio.WAVFileSource(wav_path, 1)
af_filter = radio.LowpassFilterBlock(128, bandwidth)
hilbert = radio.HilbertTransformBlock(129)
sb_filter = radio.ComplexBandpassFilterBlock(
    129, (-bandwidth, 0) if sideband == "lsb" else (0, bandwidth))
sink = radio.IQFileSink(iq_path, "f32le")

if sideband == "lsb":
    conjugate = radio.ComplexConjugateBlock()
    top.connect(source, af_filter, hilbert, conjugate, sb_filter, sink)
else:
    top.connect(source, af_filter, hilbert, sb_filter, sink)

if __name__ == "__main__":
    top.run()
