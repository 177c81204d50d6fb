"""Wideband capture -> polyphase channelizer -> banked FM demodulation,
end to end through the ordinary flow-graph API — the configuration the
reference cannot express (it tunes one channel at a time).

A 16-channel slice of spectrum is split by ChannelizerBlock in one shot;
the [16, time] batch then flows through a single WBFMMonoDemodulator
(device blocks broadcast over leading axes), producing 16 audio streams.

Run: ./luaradio-tpu examples/wideband_channelizer_bank.py <iq file> <rate>
(or with no args: a synthesized multi-carrier capture).
"""

import sys

import numpy as np

import luaradio_tpu as radio
from luaradio_tpu.core.block import Input, SinkBlock


class AudioBankSink(SinkBlock):
    """Collect the [C, time] audio bank (stand-in for per-channel sinks)."""

    def __init__(self):
        super().__init__()
        self.chunks = []
        self.add_type_signature([Input("in", lambda t: True)], [])

    def process(self, x):
        self.chunks.append(np.asarray(x))


def synth_capture(path, n=1 << 18, rate=4.096e6, channels=16):
    """Synthesize FM carriers on a 16-channel grid."""
    t = np.arange(n) / rate
    x = np.zeros(n, np.complex128)
    rng = np.random.default_rng(0)
    for c in (1, 3, 7, 12):
        tone = 400.0 * (c + 1)
        m = np.sin(2 * np.pi * tone * t)
        phase = 2 * np.pi * 75e3 * np.cumsum(m) / rate  # 75 kHz deviation
        x += np.exp(1j * (2 * np.pi * (c * rate / channels) * t + phase))
    x += 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x.astype(np.complex64).tofile(path)


if __name__ == "__main__":
    channels = 16
    if len(sys.argv) > 2:
        path, rate = sys.argv[1], float(sys.argv[2])
    else:
        path, rate = "/tmp/wideband.iq", 4.096e6
        synth_capture(path, rate=rate, channels=channels)

    top = radio.CompositeBlock()
    sink = AudioBankSink()
    top.connect(radio.IQFileSource(path, "f32le", rate),
                radio.ChannelizerBlock(channels, taps_per_branch=8),
                radio.WBFMMonoDemodulator(),
                radio.DownsamplerBlock(2),
                sink)
    top.run(chunk_size=channels * 16384)

    audio = np.concatenate(sink.chunks, axis=-1)
    print(f"demodulated {audio.shape[0]} channels x {audio.shape[1]} "
          f"samples at {rate/channels/2/1e3:.1f} kHz audio rate")
    rms = np.sqrt((audio ** 2).mean(axis=-1))
    for c in np.argsort(rms)[::-1][:4]:
        print(f"  channel {c:2d}: rms {rms[c]:.3f}")
