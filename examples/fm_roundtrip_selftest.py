"""FM round-trip self test: tone in == tone out, end to end through files.

Stage 1 modulates a cosine tone onto FM and captures it to an IQ file
(the TX analog of the reference's rtlsdr examples); stage 2 demodulates
that capture back to audio through the full mono chain
(discriminator -> lowpass -> deemphasis -> downsampler, the chain of
/root/reference/examples/rtlsdr_wbfm_mono.lua) and asserts the audio
spectral peak lands on the original tone.  Run with no arguments:

    python examples/fm_roundtrip_selftest.py

Useful as a one-command install check: it exercises sources, sinks, the
graph compiler, the fused runtime, and file I/O with a self-checked
result on whatever backend JAX selects.
"""

import math
import os
import sys
import tempfile
import wave

import numpy as np

from luaradio_tpu import CompositeBlock
from luaradio_tpu.blocks.signal.filtering import (FMDeemphasisFilterBlock,
                                                  LowpassFilterBlock)
from luaradio_tpu.blocks.signal.modem import (FrequencyDiscriminatorBlock,
                                              FrequencyModulatorBlock)
from luaradio_tpu.blocks.signal.sampling import DownsamplerBlock
from luaradio_tpu.blocks.sinks.files import IQFileSink, WAVFileSink
from luaradio_tpu.blocks.sources.files import IQFileSource
from luaradio_tpu.blocks.sources.signal import SignalSource

TONE_HZ = 3000.0
RATE = 256e3
DEVIATION = 0.3

_tmp = tempfile.mkdtemp(prefix="fm_roundtrip_")
capture_path = os.path.join(_tmp, "capture.iq")
audio_path = os.path.join(_tmp, "audio.wav")

# stage 1: tone -> FM -> IQ capture
top = CompositeBlock()
top.connect(SignalSource("cosine", TONE_HZ, rate=RATE),
            FrequencyModulatorBlock(DEVIATION),
            IQFileSink(capture_path, "f32le"))

# stage 2: IQ capture -> mono FM demod -> WAV
top2 = CompositeBlock()
top2.connect(IQFileSource(capture_path, "f32le", RATE),
             FrequencyDiscriminatorBlock(DEVIATION),
             LowpassFilterBlock(128, 10e3),
             FMDeemphasisFilterBlock(75e-6),
             DownsamplerBlock(8),
             WAVFileSink(audio_path, 1))


def main() -> int:
    top.run(max_chunks=6)
    top2.run()

    with wave.open(audio_path) as w:
        n, sr = w.getnframes(), w.getframerate()
        audio = np.frombuffer(w.readframes(n), dtype=np.int16)
    audio = audio.astype(np.float64)[len(audio) // 4:]  # skip filter warmup
    win = audio[:1 << int(math.log2(len(audio)))]
    spec = np.abs(np.fft.rfft(win * np.hanning(len(win))))
    peak_hz = np.argmax(spec[1:]) * sr / len(win)       # skip the DC bin
    print(f"audio {sr} Hz, {n} frames; spectral peak {peak_hz:.1f} Hz "
          f"(expected {TONE_HZ:.0f} Hz)")
    if abs(peak_hz - TONE_HZ) > 50:
        print("FAIL: demodulated tone off by >50 Hz")
        return 1
    print("OK: tone in == tone out")
    return 0


if __name__ == "__main__":
    sys.exit(main())
