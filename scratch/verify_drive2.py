import sys, os, wave, io
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
print("devices:", jax.devices(), flush=True)

import luaradio_tpu as radio

TONE = 3e3
RATE = 256e3

# 1. modulate: cosine -> FM -> IQ capture
cap = "/tmp/verify_cap.iq"
top = radio.CompositeBlock()
top.connect(radio.SignalSource("cosine", TONE, RATE, amplitude=0.8),
            radio.FrequencyModulatorBlock(0.3),
            radio.IQFileSink(cap, "f32le"))
top.run(max_chunks=8, chunk_size=32768)
print("capture bytes:", os.path.getsize(cap), flush=True)

# 2. demodulate: IQ -> discriminator -> LPF -> deemphasis -> downsample -> WAV
def demod(chunk_size):
    wav = f"/tmp/verify_out_{chunk_size}.wav"
    top = radio.CompositeBlock()
    top.connect(radio.IQFileSource(cap, "f32le", RATE),
                radio.FrequencyDiscriminatorBlock(0.3),
                radio.LowpassFilterBlock(128, 15e3),
                radio.FMDeemphasisFilterBlock(75e-6),
                radio.DownsamplerBlock(8),
                radio.WAVFileSink(wav, 1))
    top.run(chunk_size=chunk_size)
    with wave.open(wav) as w:
        n = w.getnframes()
        data = np.frombuffer(w.readframes(n), np.int16).astype(np.float32)
        sr = w.getframerate()
    return data, sr

a16, sr = demod(16384)
a32, _ = demod(32768)
print("audio:", len(a16), "samples @", sr, flush=True)

# chunk-size invariance
m = min(len(a16), len(a32))
assert m > 8192, m
d = np.max(np.abs(a16[:m] - a32[:m]))
print("chunk-size invariance max |diff| (int16 lsb):", d, flush=True)
assert d <= 1  # one lsb of int16 quantization

# spectral peak at the tone
x = a16[4096:4096 + 16384] * np.hanning(16384)
spec = np.abs(np.fft.rfft(x))
peak = np.argmax(spec[8:]) + 8
freq = peak * sr / 16384
print(f"spectral peak at {freq:.1f} Hz (expect {TONE:.0f})", flush=True)
assert abs(freq - TONE) < 50, freq
print("VERIFY OK", flush=True)
