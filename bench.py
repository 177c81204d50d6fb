"""Benchmark: flagship rx_wbfm mono receiver chain throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "runner_samples_per_sec": N, "runner_vs_baseline": N}

value / vs_baseline: the fused flagship step (parallel/flagship.py) —
deinterleave (MXU matmul) -> discriminator (conj-mul + atan2) -> decimating
FIR with folded deemphasis (banded-Toeplitz MXU matmul) — over an
8-channel x 4M-sample device-resident batch.

runner_*: the SAME chain built from ordinary blocks (NullSource ->
WBFMMonoDemodulator -> Downsampler -> BenchmarkSink) executed through the
real CompositeBlock/Runner pipeline, graph optimizer on — i.e. framework
overhead included (reference methodology:
/root/reference/benchmarks/luaradio_benchmark.lua:683-755).

Methodology note: this TPU is reached through a tunneled PJRT transport
with ~80 ms per host fetch, and block_until_ready does not synchronize —
so each trial dispatches a CHAIN of K steps and fetches one scalar at the
end (K calibrated so the fetch RTT is <2% of the trial).  Round 1 timed
one fetch per step and under-reported by ~2.2x.

Robustness: compiles go through a persistent on-disk compilation cache,
trials stop at a wall-clock budget, and any failure still prints a JSON
line with value 0 so the driver always records a result.

Baseline: 111.6e6 samples/s — the reference's published Frequency
Discriminator throughput on an i5-4570T (BASELINE.md), the slowest
published stage of its WBFM chain and therefore the chain's throughput
ceiling under the reference's one-process-per-block pipeline model.
"""

import json
import os
import time

import numpy as np

BASELINE_SPS = 111.6e6
TRIALS = 3
BUDGET_S = float(os.environ.get("LUARADIO_TPU_BENCH_BUDGET", "240"))
TARGET_TRIAL_S = 3.0


def _setup():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bench_raw(t_deadline: float) -> float:
    import jax
    import jax.numpy as jnp

    from luaradio_tpu.parallel.flagship import make_wbfm_mono_step

    channels, t = 8, 1 << 22  # 8 channels x 4M complex samples per step
    step, init_state = make_wbfm_mono_step(if_rate=256e3, decimation=8)
    fn = jax.jit(step, donate_argnums=(0,))

    state = init_state(channels)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((channels, 2 * t))
                    .astype(np.float32))

    def run_chain(state, k):
        t0 = time.perf_counter()
        for _ in range(k):
            state, audio = fn(state, x)
        float(state[0][0, 0])  # one host fetch = proof of completion
        return state, time.perf_counter() - t0

    state, _ = run_chain(state, 1)          # warmup / compile
    state, dt4 = run_chain(state, 4)        # calibrate
    k = int(min(256, max(8, round(TARGET_TRIAL_S / max(dt4 / 4, 1e-5)))))

    best = 0.0
    for _ in range(TRIALS):
        if best and time.perf_counter() > t_deadline:
            break
        state, dt = run_chain(state, k)
        best = max(best, k * channels * t / dt)
    return best


def bench_runner(t_deadline: float) -> float:
    from luaradio_tpu import (BenchmarkSink, CompositeBlock, DownsamplerBlock,
                              UniformRandomSource, WBFMMonoDemodulator)
    from luaradio_tpu.core.runtime import Runner
    from luaradio_tpu.types import ComplexFloat32

    chunk = 1 << 22
    top = CompositeBlock()
    # UniformRandomSource (device threefry), NOT ZeroSource: a zeros input
    # lets XLA algebraically collapse the whole chain (0 * x == 0), so the
    # measured number would be fiction.  The RNG cost is included — this
    # number UNDERSTATES the chain itself.
    top.connect(UniformRandomSource(ComplexFloat32, 256e3),
                WBFMMonoDemodulator(tau=75e-6),
                DownsamplerBlock(8),
                BenchmarkSink())
    runner = Runner(top, mode="fused", chunk_size=chunk)

    def drain():
        for seg, _ in runner.stage_plan:
            if seg is not None:
                seg.drain()

    def run_chunks(k):
        t0 = time.perf_counter()
        for _ in range(k):
            runner._pump_once()
        drain()
        return time.perf_counter() - t0

    run_chunks(1)                            # warmup / compile
    dt4 = run_chunks(4)                      # calibrate
    k = int(min(256, max(8, round(TARGET_TRIAL_S / max(dt4 / 4, 1e-5)))))

    best = 0.0
    for _ in range(TRIALS):
        if best and time.perf_counter() > t_deadline:
            break
        dt = run_chunks(k)
        best = max(best, k * chunk / dt)
    for b in runner.graph.order:
        b.cleanup()
    return best


def bench_file_runner(t_deadline: float, resident: bool) -> float:
    """File-driven rx_wbfm: the SAME chain fed from an on-disk u8 IQ
    capture (the rtl_sdr recording format).  resident=False measures the
    honest streaming ingest path (read-ahead + raw-wire transfer +
    on-device conversion, bound by the host->device link on this host);
    resident=True measures the HBM-resident loop mode (file decoded to
    device memory once, zero steady-state link traffic)."""
    import tempfile

    from luaradio_tpu import (BenchmarkSink, CompositeBlock, DownsamplerBlock,
                              IQFileSource, WBFMMonoDemodulator)
    from luaradio_tpu.core.runtime import Runner

    chunk = 1 << 22
    n_file = 4 << 20
    rng = np.random.default_rng(7)
    f = tempfile.NamedTemporaryFile(delete=False, suffix=".iq")
    f.write(rng.integers(0, 256, 2 * n_file).astype(np.uint8).tobytes())
    f.close()

    top = CompositeBlock()
    top.connect(IQFileSource(f.name, "u8", 256e3, repeat_on_eof=True,
                             resident=resident),
                WBFMMonoDemodulator(tau=75e-6),
                DownsamplerBlock(8),
                BenchmarkSink())
    runner = Runner(top, mode="fused", chunk_size=chunk)

    def drain():
        for seg, _ in runner.stage_plan:
            if seg is not None:
                seg.drain()

    def run_chunks(k):
        t0 = time.perf_counter()
        for _ in range(k):
            runner._pump_once()
        drain()
        return time.perf_counter() - t0

    run_chunks(1)
    dt4 = run_chunks(4)
    # calibrate so the trial is long enough that the one-time drain-fence
    # fetch (~50-80 ms RTT on the tunneled transport) is <3% of it — the
    # round-4 cap of 64 chunks made trials fence-dominated and
    # under-reported this row by ~2x
    k = int(min(1024, max(16, round(TARGET_TRIAL_S / max(dt4 / 4, 1e-5)))))
    best = 0.0
    for _ in range(TRIALS):
        if best and time.perf_counter() > t_deadline:
            break
        dt = run_chunks(k)
        best = max(best, k * chunk / dt)
    runner._cleanup_once()
    os.unlink(f.name)
    return best


def main():
    rec = {"metric": "rx_wbfm_chain_complex_samples_per_sec",
           "value": 0.0, "unit": "samples/s", "vs_baseline": 0.0}
    t_deadline = time.perf_counter() + BUDGET_S
    try:
        _setup()
        sps = bench_raw(t_deadline)
        rec["value"] = sps
        rec["vs_baseline"] = sps / BASELINE_SPS
    except Exception as exc:  # always emit a result line for the driver
        rec["error"] = f"{type(exc).__name__}: {exc}"[:200]
        print(json.dumps(rec))
        raise SystemExit(0)
    try:
        rsps = bench_runner(t_deadline)
        rec["runner_samples_per_sec"] = rsps
        rec["runner_vs_baseline"] = rsps / BASELINE_SPS
    except Exception as exc:
        rec["runner_error"] = f"{type(exc).__name__}: {exc}"[:200]
    # File-driven end-to-end (u8 IQ capture on disk, rtl_sdr format):
    # streaming ingest (link-bound on this host) and HBM-resident loop.
    try:
        fsps = bench_file_runner(t_deadline + 60.0, resident=False)
        rec["file_driven_samples_per_sec"] = fsps
        rec["file_driven_vs_baseline"] = fsps / BASELINE_SPS
        # the streaming row is bound by the tunneled host->device link;
        # measure that ceiling CONCURRENTLY (it drifts over minutes) and
        # report the fraction achieved (u8 IQ = 2 wire bytes/sample)
        from bench_blocks import measure_ingest_ceiling
        ceiling_mbps = measure_ingest_ceiling()
        rec["link_ceiling_mbps"] = round(ceiling_mbps, 1)
        rec["file_driven_fraction_of_link"] = round(
            fsps * 2 / (ceiling_mbps * 1e6), 3)
    except Exception as exc:
        rec["file_driven_error"] = f"{type(exc).__name__}: {exc}"[:200]
    try:
        fr = bench_file_runner(t_deadline + 90.0, resident=True)
        rec["file_resident_samples_per_sec"] = fr
        rec["file_resident_vs_baseline"] = fr / BASELINE_SPS
    except Exception as exc:
        rec["file_resident_error"] = f"{type(exc).__name__}: {exc}"[:200]
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
