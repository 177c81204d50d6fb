"""Profile the generic time-sharded Runner overhead (VERDICT r3 item 1).

Measures the run_generic WBFM graph at 1/2/4/8 shards, plus ablations:
  - full graph (discriminator + FIR + deemphasis + downsampler)
  - elementwise-only graph (time_local blocks: zero collectives)
  - each block alone
to see whether the 50% @ 8 shards is collectives or SPMD bookkeeping.
"""
import os, sys, time
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags +
                               " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jax.sharding import Mesh

import luaradio_tpu as lr
from luaradio_tpu.core.runtime import Runner
from luaradio_tpu.types import ComplexFloat32


def build(kind):
    top = lr.CompositeBlock()
    src = lr.UniformRandomSource(ComplexFloat32, 256e3)
    if kind == "full":
        top.connect(src, lr.WBFMMonoDemodulator(), lr.DownsamplerBlock(8),
                    lr.NopSink())
    elif kind == "elementwise":
        top.connect(src, lr.MultiplyConstantBlock(2.0),
                    lr.ComplexMagnitudeBlock(), lr.NopSink())
    elif kind == "disc":
        top.connect(src, lr.FrequencyDiscriminatorBlock(1.25), lr.NopSink())
    elif kind == "fir":
        top.connect(src, lr.LowpassFilterBlock(64, 15e3, use_fft=False),
                    lr.NopSink())
    elif kind == "deemph":
        top.connect(src, lr.FrequencyDiscriminatorBlock(1.25),
                    lr.FMDeemphasisFilterBlock(75e-6), lr.NopSink())
    return top


def time_run(kind, mesh, chunk=1 << 16):
    r = Runner(build(kind), mode="fused", chunk_size=chunk, mesh=mesh)
    segs = [s for s, _ in r.stage_plan if s is not None]
    r._pump_once()
    for s in segs:
        s.drain()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            r._pump_once()
        for s in segs:
            s.drain()
        best = min(best, (time.perf_counter() - t0) / 4)
    r._cleanup_once()
    return best


if __name__ == "__main__":
    devices = jax.devices()
    for kind in ["elementwise", "disc", "fir", "deemph", "full"]:
        base = time_run(kind, None)
        row = {"kind": kind, "base_ms": round(base * 1e3, 2)}
        for n in (2, 4, 8):
            mesh = Mesh(np.asarray(devices[:n]), ("time",))
            t = time_run(kind, mesh)
            row[f"ovh{n}"] = round(t / base - 1.0, 3)
        print(row, flush=True)
