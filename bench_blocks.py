"""Per-block benchmark suite, mirroring the reference harness
(/root/reference/benchmarks/luaradio_benchmark.lua:9-13,636-755): each row
times ``source -> block-under-test -> BenchmarkSink`` through the real
Runner and reports samples/s at the block's output, with the reference's
published i5-4570T numbers (BASELINE.md) as the vs-baseline column.

Usage:
    python bench_blocks.py [--out BENCH_BLOCKS.json] [--only SUBSTR]
                           [--duration SECS]

Emits one JSON object per row on stdout and (optionally) an aggregate JSON
file.  Methodology: one warmup chunk (compile; persistent-cached), then
timed chunks until ``--duration`` elapses; best-trial samples/s like the
reference's max-of-trials.  The BenchmarkSink fetches one trailing element
per chunk, which is the host-side proof of completion on tunneled TPU
backends.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

CHUNK = 1 << 22  # 4M samples: amortizes per-dispatch link latency (tunneled PJRT)
RNG = np.random.default_rng(12345)

# Rows whose per-chunk device time at 4M samples is comparable to the
# per-dispatch host cost of the tunneled backend (trivial/layout blocks at
# many GS/s): run them with larger chunks so the row measures the block,
# not the dispatch path.  chunk_size is an ordinary user-facing runtime
# parameter; the value used is recorded in the row.
CHUNK_OVERRIDES = {
    "Null Source (Complex)": 1 << 24,
    "Null Source (Real)": 1 << 24,
    "Downsampler (M = 5), Complex": 5 << 22,
    "Downsampler (M = 5), Real": 5 << 22,
    "Zero Crossing Clock Recovery": 1 << 23,
    "Upsampler (L = 3), Complex": 1 << 23,
    "Upsampler (L = 3), Real": 1 << 23,
}


def _setup_jax():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _tmpfile(data: bytes) -> str:
    f = tempfile.NamedTemporaryFile(delete=False, suffix=".bin")
    f.write(data)
    f.close()
    return f.name


def _iq_bytes(n: int) -> bytes:
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
         ).astype(np.complex64)
    return x.tobytes()


def _f32_bytes(n: int) -> bytes:
    return RNG.standard_normal(n).astype(np.float32).tobytes()


def benchmarks():
    """Yield (name, baseline_i5_msps, build) rows.  build() returns
    (top, block_under_test)."""
    import luaradio_tpu as lr
    from luaradio_tpu.types import Bit, Byte, ComplexFloat32, Float32

    C64, F32 = ComplexFloat32, Float32
    rate = 1e6

    # Block rows feed from UniformRandomSource (device threefry), NOT
    # NullSource as the reference harness does: on TPU a zeros input lets
    # XLA algebraically collapse multiplies/filters (0 * x == 0) and the
    # row would measure nothing.  The RNG cost is fused into the same XLA
    # program, so every block row UNDERSTATES the block itself — compare
    # against the "Uniform Random Source" rows for the feeder's own cost.
    def null_c():
        return lr.UniformRandomSource(C64, rate)

    def null_f():
        return lr.UniformRandomSource(F32, rate)

    def rand_f():
        return lr.UniformRandomSource(F32, rate)

    def rand_bit():
        return lr.UniformRandomSource(Bit, rate)

    def simple(mk_src, mk_blk):
        def build():
            top = lr.CompositeBlock()
            blk = mk_blk()
            sink = lr.BenchmarkSink()
            top.connect(mk_src(), blk, sink)
            return top, blk
        return build

    def two_in(mk_src, mk_blk):
        def build():
            top = lr.CompositeBlock()
            blk = mk_blk()
            s1, s2 = mk_src(), mk_src()
            top.connect(s1, "out", blk, "in1")
            top.connect(s2, "out", blk, "in2")
            top.connect(blk, lr.BenchmarkSink())
            return top, blk
        return build

    def _pll_acquire_build():
        top = lr.CompositeBlock()
        tone = lr.SignalSource("exponential", 210e3, rate)
        noise = lr.UniformRandomSource(C64, rate)
        scale = lr.MultiplyConstantBlock(0.8)
        add = lr.AddBlock()
        blk = lr.PLLBlock(1e3, 200e3, 220e3)
        top.connect(tone, "out", add, "in1")
        top.connect(noise, scale)
        top.connect(scale, "out", add, "in2")
        top.connect(add, blk, lr.BenchmarkSink())
        return top, blk

    taps16 = RNG.standard_normal(16).astype(np.float32)
    taps128 = RNG.standard_normal(128).astype(np.float32)
    taps256 = RNG.standard_normal(256).astype(np.float32)
    taps16c = (RNG.standard_normal(16) + 1j * RNG.standard_normal(16)
               ).astype(np.complex64)
    taps128c = (RNG.standard_normal(128) + 1j * RNG.standard_normal(128)
                ).astype(np.complex64)

    def five_fir():
        top = lr.CompositeBlock()
        src = lr.UniformRandomSource(C64, rate)
        blocks = [lr.FIRFilterBlock(taps256, use_fft=True) for _ in range(5)]
        top.connect(src, *blocks, lr.BenchmarkSink())
        return top, blocks[-1]

    rows = [
        ("Five Back to Back FIR Filters (FFT, 256 Real taps, Complex input)",
         42.6, five_fir),
        ("Null Source (Complex)", 1357.3,
         simple(lambda: lr.NullSource(C64, rate), lambda: lr.NopBlock())),
        ("Null Source (Real)", 2941.9,
         simple(lambda: lr.NullSource(F32, rate), lambda: lr.NopBlock())),
        ("Uniform Random Source (Complex)", 93.8,
         simple(lambda: lr.UniformRandomSource(C64, rate),
                lambda: lr.NopBlock())),
        ("Uniform Random Source (Real)", 176.2,
         simple(rand_f, lambda: lr.NopBlock())),
        ("Signal Source (Complex Exponential)", 43.5,
         simple(lambda: lr.SignalSource("exponential", 200e3, rate),
                lambda: lr.NopBlock())),
        ("Signal Source (Cosine)", 80.6,
         simple(lambda: lr.SignalSource("cosine", 200e3, rate),
                lambda: lr.NopBlock())),
        ("Signal Source (Square)", 97.1,
         simple(lambda: lr.SignalSource("square", 200e3, rate),
                lambda: lr.NopBlock())),
        ("FIR Filter (16 Real taps, Complex input)", 67.5,
         simple(null_c, lambda: lr.FIRFilterBlock(taps16, use_fft=False))),
        ("FIR Filter (16 Real taps, Real input)", 84.7,
         simple(null_f, lambda: lr.FIRFilterBlock(taps16, use_fft=False))),
        ("FIR Filter (16 Complex taps, Complex input)", 58.9,
         simple(null_c, lambda: lr.FIRFilterBlock(taps16c, use_fft=False))),
        ("FIR Filter (FFT, 128 Real taps, Complex input)", 133.9,
         simple(null_c, lambda: lr.FIRFilterBlock(taps128, use_fft=True))),
        ("FIR Filter (FFT, 128 Real taps, Real input)", 141.5,
         simple(null_f, lambda: lr.FIRFilterBlock(taps128, use_fft=True))),
        ("FIR Filter (FFT, 128 Complex taps, Complex input)", 132.7,
         simple(null_c, lambda: lr.FIRFilterBlock(taps128c, use_fft=True))),
        ("IIR Filter (5 ff 3 fb Real taps, Complex input)", 52.2,
         simple(null_c, lambda: lr.IIRFilterBlock(
             np.float32([0.2, 0.2, 0.2, 0.2, 0.2]),
             np.float32([1.0, 0.1, 0.05])))),
        ("IIR Filter (5 ff 3 fb Real taps, Real input)", 98.9,
         simple(null_f, lambda: lr.IIRFilterBlock(
             np.float32([0.2, 0.2, 0.2, 0.2, 0.2]),
             np.float32([1.0, 0.1, 0.05])))),
        ("FM Deemphasis Filter", 139.9,
         simple(null_f, lambda: lr.FMDeemphasisFilterBlock(75e-6))),
        ("Downsampler (M = 5), Complex", 144.1,
         simple(null_c, lambda: lr.DownsamplerBlock(5))),
        ("Downsampler (M = 5), Real", 253.1,
         simple(null_f, lambda: lr.DownsamplerBlock(5))),
        ("Upsampler (L = 3), Complex", 702.6,
         simple(null_c, lambda: lr.UpsamplerBlock(3))),
        ("Upsampler (L = 3), Real", 1259.6,
         simple(null_f, lambda: lr.UpsamplerBlock(3))),
        ("Frequency Translator", 396.7,
         simple(null_c, lambda: lr.FrequencyTranslatorBlock(200e3))),
        ("Hilbert Transform (65 taps)", 67.7,
         simple(null_f, lambda: lr.HilbertTransformBlock(65))),
        ("Hilbert Transform (129 taps)", 47.5,
         simple(null_f, lambda: lr.HilbertTransformBlock(129))),
        ("Frequency Discriminator", 111.6,
         simple(null_c, lambda: lr.FrequencyDiscriminatorBlock(1.25))),
        ("PLL", 5.5,
         simple(null_c, lambda: lr.PLLBlock(1e3, 200e3, 220e3))),
        # The noise-fed row above never locks, so it measures the sequential
        # fallback kernel (the reference methodology).  Locked tracking — the
        # steady state of every real receiver — takes the parallel-in-time
        # linear path (ops/pll_linear.py); same baseline number.
        ("PLL (locked, tone input)", 5.5,
         simple(lambda: lr.SignalSource("exponential", 210e3, rate),
                lambda: lr.PLLBlock(1e3, 200e3, 220e3))),
        # Unlocked-but-carrier-bearing input (acquisition / low SNR): the
        # overlap-and-discard batched scan (ops/pll_overlap.py) — the
        # full-chunk linear guard fails, but warm-up segments validate.
        # Pure noise (the row above) is diffusive and stays sequential.
        ("PLL (acquiring, +3 dB tone in noise)", 5.5, _pll_acquire_build),
        ("Zero Crossing Clock Recovery", 72.0,
         simple(rand_f, lambda: lr.ZeroCrossingClockRecoveryBlock(1200))),
        ("Binary Phase Corrector", 54.8,
         simple(null_c, lambda: lr.BinaryPhaseCorrectorBlock(3000))),
        ("Add (Complex)", 226.4, two_in(null_c, lambda: lr.AddBlock())),
        ("Subtract (Complex)", 224.0,
         two_in(null_c, lambda: lr.SubtractBlock())),
        ("Multiply (Complex)", 280.6,
         two_in(null_c, lambda: lr.MultiplyBlock())),
        ("Multiply (Real)", 608.6, two_in(null_f, lambda: lr.MultiplyBlock())),
        ("Multiply Conjugate", 291.6,
         two_in(null_c, lambda: lr.MultiplyConjugateBlock())),
        ("Multiply Constant (Real constant, Complex input)", 308.6,
         simple(null_c, lambda: lr.MultiplyConstantBlock(2.5))),
        ("Multiply Constant (Complex constant, Complex input)", 254.5,
         simple(null_c, lambda: lr.MultiplyConstantBlock(2.5 + 1j))),
        ("Multiply Constant (Real constant, Real input)", 570.7,
         simple(null_f, lambda: lr.MultiplyConstantBlock(2.5))),
        ("Absolute Value", 647.5,
         simple(null_f, lambda: lr.AbsoluteValueBlock())),
        ("Complex Conjugate", 383.4,
         simple(null_c, lambda: lr.ComplexConjugateBlock())),
        ("Complex Magnitude", 297.4,
         simple(null_c, lambda: lr.ComplexMagnitudeBlock())),
        ("Complex Phase", 130.0,
         simple(null_c, lambda: lr.ComplexPhaseBlock())),
        ("Delay (N = 3000, Complex input)", 473.4,
         simple(null_c, lambda: lr.DelayBlock(3000))),
        ("Bit Slicer", 92.6, simple(rand_f, lambda: lr.SlicerBlock())),
        ("Differential Decoder", 157.3,
         simple(rand_bit, lambda: lr.DifferentialDecoderBlock())),
        ("Complex to Real", 554.8,
         simple(null_c, lambda: lr.ComplexToRealBlock())),
        ("Complex to Imaginary", 555.6,
         simple(null_c, lambda: lr.ComplexToImagBlock())),
    ]

    def float_to_complex():
        top = lr.CompositeBlock()
        blk = lr.FloatToComplexBlock()
        s1, s2 = null_f(), null_f()
        top.connect(s1, "out", blk, "real")
        top.connect(s2, "out", blk, "imag")
        top.connect(blk, lr.BenchmarkSink())
        return top, blk

    rows.append(("Float to Complex", 397.7, float_to_complex))

    # File sources need on-disk fixtures large enough not to EOF mid-trial.
    # BASELINE-comparable rows use resident=False: they measure the honest
    # sustained host->file->device streaming path (read-ahead thread +
    # overlapped transfer), which on this host is bound by the measured
    # host->device link rate (see "ingest_ceiling_mbps" in the output), not
    # by compute.  The device-resident loop mode — the TPU-native design
    # for repeating playback, zero link traffic in steady state — is
    # reported as separate non-baseline rows.
    n_file = 4 << 20

    def file_row(mk_src):
        def build():
            top = lr.CompositeBlock()
            blk = lr.NopBlock()
            top.connect(mk_src(), blk, lr.BenchmarkSink())
            return top, blk
        return build

    iq_path = _tmpfile(_iq_bytes(n_file))
    f32_path = _tmpfile(_f32_bytes(n_file))
    u8_path = _tmpfile((RNG.integers(0, 256, 2 * n_file)
                        ).astype(np.uint8).tobytes())

    rows.insert(1, ("IQ File Source (f32le)", 280.1, file_row(
        lambda: lr.IQFileSource(iq_path, "f32le", rate, repeat_on_eof=True,
                                resident=False))))
    rows.insert(2, ("Real File Source (f32le)", 506.4, file_row(
        lambda: lr.RealFileSource(f32_path, "f32le", rate,
                                  repeat_on_eof=True, resident=False))))
    rows.insert(3, ("Raw File Source (float)", 1312.4, file_row(
        lambda: lr.RawFileSource(f32_path, Float32, rate,
                                 repeat_on_eof=True, resident=False))))
    # non-baseline rows: device-side wire conversion (u8 = 2 bytes/sample
    # over the link) and the HBM-resident loop (no link traffic at all)
    rows.insert(4, ("IQ File Source (u8, device-side conversion)", None,
                    file_row(lambda: lr.IQFileSource(
                        u8_path, "u8", rate, repeat_on_eof=True,
                        resident=False))))
    rows.insert(5, ("IQ File Source (f32le, HBM-resident loop)", None,
                    file_row(lambda: lr.IQFileSource(
                        iq_path, "f32le", rate, repeat_on_eof=True))))
    return rows


def measure_ingest_ceiling(nbytes: int = 32 << 20, k: int = 6) -> float:
    """Sustained host->device link rate (MB/s) measured NOW: the structural
    ceiling of every streaming file-source row on this host.  The tunneled
    TPU transport serves an initial burst at GB/s then throttles to
    ~50-200 MB/s, so the burst credits are drained (8 x 32 MB) before
    timing to report the SUSTAINED rate the rows actually see."""
    import jax
    arr = RNG.standard_normal(nbytes // 4).astype(np.float32)
    for _ in range(8):
        jax.device_put(arr).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(k):
        jax.device_put(arr).block_until_ready()
    return k * arr.nbytes / (time.perf_counter() - t0) / 1e6


def bench_one(name, baseline, build, duration=3.0):
    """Dispatch K chunks asynchronously, then drain: one device fence per
    trial, so the high per-fetch RTT of tunneled backends is amortized and
    the measured number is device throughput, not link latency."""
    from luaradio_tpu.core.block import SinkBlock
    from luaradio_tpu.core.composite import PortRef
    from luaradio_tpu.core.runtime import Runner
    top, blk = build()
    chunk = CHUNK_OVERRIDES.get(name, CHUNK)
    runner = Runner(top, mode="fused", chunk_size=chunk)
    if id(blk) in runner.graph.out_chunk:
        n_out = runner.graph.out_chunk[id(blk)]
    else:
        # the graph optimizer fused the block-under-test away (e.g. IIR ->
        # decimating FIR); count at the sink's input edge instead
        sink = next(b for b in runner.graph.order if isinstance(b, SinkBlock))
        src = runner.graph.edges[PortRef(sink, 0)]
        n_out = runner.graph.out_chunk[id(src.block)]
    t = blk.get_output_type() if blk.outputs else blk.get_input_type()

    def drain():
        for seg, _ in runner.stage_plan:
            if seg is not None:
                seg.drain()

    pump = runner._pump_once
    try:
        if not pump():  # warmup / compile
            raise RuntimeError("EOF during warmup; fixture too small")
        drain()
        # calibrate: chunks per trial so one trial >> fence RTT
        t0 = time.perf_counter()
        for _ in range(4):
            if not pump():
                raise RuntimeError("EOF during calibration")
        drain()
        dt4 = time.perf_counter() - t0
        k = max(4, min(512, int(4 * max(1.0, 1.0 / max(dt4, 1e-3)))))
        best = 0.0
        t_end = time.perf_counter() + duration
        while True:
            t0 = time.perf_counter()
            for _ in range(k):
                if not pump():
                    raise RuntimeError("EOF during trial")
            drain()
            dt = time.perf_counter() - t0
            best = max(best, k * n_out / dt)
            if time.perf_counter() > t_end:
                break
    finally:
        runner._cleanup_once()
    rec = {"name": name, "samples_per_second": best,
           "msps": best / 1e6, "baseline_i5_msps": baseline,
           "chunk": chunk,
           "dtype": t.name if t is not None else "?"}
    if baseline is not None:
        rec["vs_baseline"] = best / 1e6 / baseline
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--duration", type=float, default=3.0)
    args = ap.parse_args()
    _setup_jax()

    results = []
    for name, baseline, build in benchmarks():
        if args.only and args.only.lower() not in name.lower():
            continue
        try:
            rec = bench_one(name, baseline, build, duration=args.duration)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            rec = {"name": name, "baseline_i5_msps": baseline,
                   "error": f"{type(exc).__name__}: {exc}"[:300]}
        if "File Source" in name and "resident" not in name:
            # the tunnel throttle drifts over minutes: re-measure the link
            # ceiling PER ROW, right after the row it bounds
            ceiling = measure_ingest_ceiling()
            rec["ingest_ceiling_mbps"] = round(ceiling, 1)
            # wire bytes/sample by row: u8 IQ=2, f32 IQ=8, f32 real/raw=4
            bps = {"IQ File Source (f32le)": 8,
                   "Real File Source (f32le)": 4,
                   "Raw File Source (float)": 4,
                   "IQ File Source (u8, device-side conversion)": 2}.get(name)
            if "msps" in rec and bps:
                rec["wire_bytes_per_sample"] = bps
                rec["fraction_of_link_ceiling"] = round(
                    rec["msps"] * bps / ceiling, 3)
            rec["note"] = ("streaming row: bound by the sustained "
                           "host->device link rate measured alongside it, "
                           "not by compute")
        print(json.dumps(rec), flush=True)
        results.append(rec)

    if args.out:
        import jax
        ok = [r for r in results if "error" not in r and "vs_baseline" in r]
        agg = {
            "rows": results,
            "n_rows": len(results),
            "n_ok": len([r for r in results if "error" not in r]),
            "geomean_vs_baseline": (
                float(np.exp(np.mean([np.log(r["vs_baseline"])
                                      for r in ok]))) if ok else 0.0),
            "platform": jax.devices()[0].platform,
            "environment_note": (
                "this TPU is reached through a shared tunneled transport "
                "whose throughput drifts ~2x over minutes (observed on "
                "identical code, e.g. trivial elementwise rows moving "
                "12x<->35x between runs); compare rows run-to-run with "
                "that variance in mind, and treat kernel-attributed "
                "artifacts (ROOFLINE_*.json ablations) as the stable "
                "signal"),
        }
        with open(args.out, "w") as f:
            json.dump(agg, f, indent=1)
        print(f"wrote {args.out}: {agg['n_ok']}/{agg['n_rows']} rows, "
              f"geomean vs baseline {agg['geomean_vs_baseline']:.2f}x",
              file=sys.stderr)


if __name__ == "__main__":
    main()
