"""Benchmark: flagship rx_wbfm mono receiver chain throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology mirrors the reference harness (5 timed trials after warmup,
mean samples/s — /root/reference/benchmarks/luaradio_benchmark.lua:683-755),
measuring complex IF samples/s through the fused
discriminator -> 128-tap AF FIR -> deemphasis -> decimate chain with
device-resident state.

Baseline: 111.6e6 samples/s — the reference's published Frequency
Discriminator throughput on an i5-4570T (BASELINE.md), which is the slowest
published stage of its WBFM chain and therefore the chain's throughput
ceiling under the reference's one-process-per-block pipeline model.
"""

import json
import time

import numpy as np

BASELINE_SPS = 111.6e6


def main():
    import jax
    import jax.numpy as jnp

    from luaradio_tpu.parallel.flagship import make_wbfm_mono_step

    channels, t = 8, 1 << 20  # 8 channels x 1M complex samples per step
    step, init_state = make_wbfm_mono_step(if_rate=256e3, decimation=8)
    fn = jax.jit(step, donate_argnums=(0,))

    state = init_state(channels)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((channels, 2 * t))
                    .astype(np.float32))

    # warmup (compile)
    state, y = fn(state, x)
    jax.block_until_ready(y)

    trials = []
    iters = 8
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, y = fn(state, x)
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        trials.append(channels * t * iters / dt)

    sps = float(np.mean(trials))
    print(json.dumps({
        "metric": "rx_wbfm_chain_complex_samples_per_sec",
        "value": sps,
        "unit": "samples/s",
        "vs_baseline": sps / BASELINE_SPS,
    }))


if __name__ == "__main__":
    main()
