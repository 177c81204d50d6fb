"""Verify drive: FM round-trip on the real TPU, per .claude/skills/verify."""
import sys, wave, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import luaradio_tpu as lr

tone = 1200.0
rate = 256e3
iq_path = "/tmp/verify_fm.iq"
wav_path = "/tmp/verify_fm.wav"

# 1. modulate a tone and capture IQ
t0 = time.time()
top = lr.CompositeBlock()
top.connect(lr.SignalSource("cosine", tone, rate),
            lr.FrequencyModulatorBlock(0.2),
            lr.IQFileSink(iq_path, "f32le"))
top.run(max_chunks=4, chunk_size=65536)
print(f"modulate ok ({time.time()-t0:.1f}s)", flush=True)

# 2. demodulate through the WBFM-style chain (optimizer ON by default)
def demod(chunk_size, out_path):
    top = lr.CompositeBlock()
    top.connect(lr.IQFileSource(iq_path, "f32le", rate),
                lr.FrequencyDiscriminatorBlock(0.2),
                lr.LowpassFilterBlock(128, 15e3),
                lr.FMDeemphasisFilterBlock(75e-6),
                lr.DownsamplerBlock(8),
                lr.WAVFileSink(out_path, 1))
    top.run(chunk_size=chunk_size)

t0 = time.time()
demod(65536, wav_path)
print(f"demod ok ({time.time()-t0:.1f}s)", flush=True)

# 3. check the spectral peak
w = wave.open(wav_path)
n = w.getnframes()
data = np.frombuffer(w.readframes(n), dtype=np.int16).astype(np.float64)
w.close()
seg = data[len(data)//4:]
spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
freqs = np.fft.rfftfreq(len(seg), d=8 / rate)
peak = freqs[np.argmax(spec[1:]) + 1]
print(f"peak at {peak:.1f} Hz (expect {tone})", flush=True)
assert abs(peak - tone) < 20, (peak, tone)

# 4. chunk-size invariance (streaming state across different chunking)
demod(16384, "/tmp/verify_fm2.wav")
w2 = wave.open("/tmp/verify_fm2.wav")
d2 = np.frombuffer(w2.readframes(w2.getnframes()), dtype=np.int16)
w2.close()
n = min(len(d2), len(data))
diff = np.max(np.abs(d2[:n].astype(np.int32) - data[:n].astype(np.int32)))
print(f"chunk invariance: max int16 diff {diff}", flush=True)
assert diff <= 1, diff

# 5. error paths
def expect(exc, fn):
    try:
        fn()
    except exc as e:
        return print(f"  ok: {type(e).__name__}: {str(e)[:60]}", flush=True)
    raise AssertionError(f"no {exc.__name__}")

expect(Exception, lambda: lr.IQFileSource("/tmp/nope.iq", "f32le", 1e6)
       .initialize())
expect(ValueError, lambda: lr.SignalSource("sineish", 1e3, 1e6))
expect(ValueError, lambda: lr.IQFileSource(iq_path, "f99le", 1e6))

def unconnected():
    top = lr.CompositeBlock()
    fir = lr.FIRFilterBlock(np.ones(4, np.float32))
    top.connect(lr.SignalSource("cosine", 1e3, 1e6), fir)
    m = lr.MultiplyBlock()
    top.connect(fir, "out", m, "in1")
    top.connect(m, lr.NopSink())
    top.run(max_chunks=1)
expect(ValueError, unconnected)

# type mismatch: Bit-typed block fed complex
def type_mismatch():
    top = lr.CompositeBlock()
    top.connect(lr.SignalSource("exponential", 1e3, 1e6),
                lr.DifferentialDecoderBlock(), lr.NopSink())
    top.run(max_chunks=1)
expect(ValueError, type_mismatch)

# stop/wait before start are no-ops
top = lr.CompositeBlock()
top.connect(lr.SignalSource("cosine", 1e3, 1e6), lr.NopSink())
top.stop(); top.wait()
print("stop/wait before start: ok", flush=True)

print("VERIFY PASS", flush=True)
