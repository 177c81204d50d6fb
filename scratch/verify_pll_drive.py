"""Drive the PLL hybrid through the real library runtime on the TPU:
SignalSource exponential tone -> PLLBlock (locked path) -> collect, then
assert the recovered carrier tracks the tone."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
print("devices:", jax.devices(), flush=True)

import luaradio_tpu as radio
from luaradio_tpu.core.block import Input
from luaradio_tpu.core.composite import CompositeBlock

RATE = 1e6
TONE = 210e3


class Collect(radio.SinkBlock):
    def __init__(self):
        super().__init__()
        self.chunks = []
        self.add_type_signature([Input("in", lambda t: True)], [])

    def process(self, x):
        self.chunks.append(np.asarray(x))


top = CompositeBlock()
pll = radio.PLLBlock(1e3, 200e3, 220e3)
out_sink, err_sink = Collect(), Collect()
src = radio.SignalSource("exponential", TONE, RATE)
top.connect(src, pll)
top.connect(pll, "out", out_sink, "in")
top.connect(pll, "error", err_sink, "in")
top.run(max_chunks=6, chunk_size=1 << 18)

out = np.concatenate(out_sink.chunks)
err = np.concatenate(err_sink.chunks)
print("samples:", out.shape, "err tail mean:", np.mean(np.abs(err[-10000:])),
      flush=True)
assert np.mean(np.abs(err[-10000:])) < 1e-3

# locked carrier must be a unit tone at TONE: check spectral peak
w = out[-(1 << 16):] * np.hanning(1 << 16)
spec = np.abs(np.fft.fft(w))
peak = np.argmax(spec)
freq = peak / (1 << 16) * RATE
print(f"carrier peak at {freq:.0f} Hz (expect {TONE:.0f})", flush=True)
assert abs(freq - TONE) < 100
print("VERIFY PLL OK", flush=True)
