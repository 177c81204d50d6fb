"""Roofline / efficiency accounting for the headline TPU rows.

Round-4 VERDICT: "the framework has no idea how fast it actually is in
absolute terms" — every perf artifact reported ratios against a 2014 i5.
This harness measures the chip's ACHIEVABLE resource rates with Pallas
probes, then states, for each headline row, which resource binds it and
what fraction of that measured roofline the row achieves:

* HBM bandwidth: tiled copy kernels (serial-DMA and double-buffered) —
  the realistic ceiling for streaming kernels, not the datasheet number.
* MXU rate: a large bf16 matmul with f32 accumulation — the unit every
  exact-f32 emulated matmul pass is made of.
* VPU transcendental rate: an in-kernel atan2 probe at flagship shape.
* Scalar-core latency: cycles/sample of the PLL's sequential loop.

Attribution evidence for the flagship kernel (ablations measured in
round 5, scratch/roofline_probe.py): replacing atan2 with a multiply
changes nothing (not VPU-bound); a DMA-only variant runs ~4.5x faster
(not HBM-bound); the exact-f32 emulated MXU passes are the binding
resource.

Writes ROOFLINE_r{N}.json and prints it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def _setup():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def _timeit(fn, args, fence, target_s=2.0, max_iters=256):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    fence(fn(*args))
    dt1 = time.perf_counter() - t0
    k = int(min(max_iters, max(4, round(target_s / max(dt1, 1e-5)))))
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / k


def measure_hbm_copy(jax, double_buffered: bool):
    """Achievable HBM bandwidth: [8, 2T] f32 copy through VMEM tiles."""
    import functools
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, T = 8, 1 << 22
    tile = 1 << 15

    if double_buffered:
        n = 2 * T // tile

        def kern(x_ref, o_ref, xw, sems):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                pltpu.make_async_copy(x_ref.at[:, pl.ds(0, tile)],
                                      xw.at[0], sems.at[0]).start()

            @pl.when(i + 1 < n)
            def _():
                pltpu.make_async_copy(
                    x_ref.at[:, pl.ds((i + 1) * tile, tile)],
                    xw.at[(i + 1) % 2], sems.at[(i + 1) % 2]).start()

            pltpu.make_async_copy(x_ref.at[:, pl.ds(i * tile, tile)],
                                  xw.at[i % 2], sems.at[i % 2]).wait()
            o_ref[:, :] = xw[i % 2]

        scratch = [pltpu.VMEM((2, C, tile), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        def kern(x_ref, o_ref, xw, sem):
            i = pl.program_id(0)
            cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(i * tile, tile)],
                                       xw, sem)
            cp.start()
            cp.wait()
            o_ref[:, :] = xw[:, :]

        scratch = [pltpu.VMEM((C, tile), jnp.float32),
                   pltpu.SemaphoreType.DMA]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern, grid=(2 * T // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((C, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, 2 * T), jnp.float32),
            scratch_shapes=scratch,
        )(x)

    import jax.numpy as jnp
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (C, 2 * T)).astype(np.float32))
    dt = _timeit(run, (x,), lambda o: float(o[0, 0]))
    nbytes = C * 2 * T * 4 * 2      # read + write
    return nbytes / dt / 1e9


def measure_mxu_bf16(jax):
    """Sustained bf16 matmul rate with f32 accumulation (one emulation
    pass of every exact-f32 matmul in the framework)."""
    import jax.numpy as jnp

    m = 8192
    a = jnp.asarray(np.random.default_rng(1).standard_normal(
        (m, m)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(2).standard_normal(
        (m, m)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dt = _timeit(mm, (a, b), lambda o: float(o[0, 0]))
    return 2 * m ** 3 / dt / 1e12


def measure_vpu_atan2(jax):
    """In-kernel atan2 rate at flagship shape (read 2 f32, write 1)."""
    import functools
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from luaradio_tpu.ops.pll import _atan2

    C, T = 8, 1 << 22
    tile = 1 << 15

    def kern(x_ref, o_ref, xw, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(i * tile, tile)],
                                   xw, sem)
        cp.start()
        cp.wait()
        o_ref[:, :] = _atan2(xw[:, :tile // 2], xw[:, tile // 2:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern, grid=(2 * T // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((C, tile // 2), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, T), jnp.float32),
            scratch_shapes=[pltpu.VMEM((C, tile), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(x)

    import jax.numpy as jnp
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (C, 2 * T)).astype(np.float32))
    dt = _timeit(run, (x,), lambda o: float(o[0, 0]))
    return C * T / dt / 1e9


def measure_flagship(jax):
    import jax.numpy as jnp
    from luaradio_tpu.parallel.flagship import make_wbfm_mono_step

    C, T = 8, 1 << 22
    step, init_state = make_wbfm_mono_step(if_rate=256e3, decimation=8)
    fn = jax.jit(step, donate_argnums=(0,))
    state = init_state(C)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (C, 2 * T)).astype(np.float32))

    def chain(state, k):
        t0 = time.perf_counter()
        for _ in range(k):
            state, audio = fn(state, x)
        float(state[0][0, 0])
        return state, time.perf_counter() - t0

    state, _ = chain(state, 1)
    state, dt4 = chain(state, 4)
    k = int(min(256, max(8, round(3.0 / max(dt4 / 4, 1e-5)))))
    state, dt = chain(state, k)
    return k * C * T / dt / 1e9


def measure_pll_noise(jax):
    import jax.numpy as jnp
    from luaradio_tpu.ops.pll import pll_pallas

    n = 1 << 22
    xp = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, n)).astype(np.float32))
    st = jnp.zeros((3,), jnp.float32)
    f = jax.jit(lambda xp, st: pll_pallas(xp, st, 0.0166, 0.000139,
                                          -0.1, 0.1, 1.0, interpret=False))
    out, err, s2 = f(xp, st)
    float(s2[0])
    s_ = st
    t0 = time.perf_counter()
    K = 12
    for _ in range(K):
        out, err, s_ = f(xp, s_)
    float(s_[0])
    return n / ((time.perf_counter() - t0) / K) / 1e6


def main():
    jax = _setup()
    dev = jax.devices()[0]
    hw = {
        "device": str(dev),
        "platform": dev.platform,
        "hbm_copy_serial_dma_GBps": round(measure_hbm_copy(jax, False), 1),
        "hbm_copy_double_buffered_GBps": round(
            measure_hbm_copy(jax, True), 1),
        "mxu_bf16_f32acc_TFLOPs": round(measure_mxu_bf16(jax), 1),
        "vpu_atan2_inkernel_GSps": round(measure_vpu_atan2(jax), 2),
    }
    hbm = hw["hbm_copy_double_buffered_GBps"]
    mxu = hw["mxu_bf16_f32acc_TFLOPs"]

    flag = measure_flagship(jax)
    # flagship per-sample MXU work (exact-f32 emulation passes):
    #   deinterleave: 3 bf16 passes x 1024 flop  = 3072
    #   decimating FIR (3-pass split22, W=1145, D=8): 3 x 2*1145/8 = 859
    flag_flops = 3072 + 859
    flag_mxu_roof = mxu * 1e3 / flag_flops          # GS/s
    flag_hbm_roof = hbm / 8.5                       # 8B read + 0.5B write
    rows = [{
        "name": "flagship_wbfm_kernel (bench.py value)",
        "measured_GSps": round(flag, 2),
        "binding_resource": (
            "MXU: exact-f32 emulated matmuls "
            f"({flag_flops} bf16 flop/sample — 3-pass exact deinterleave "
            "+ 3-pass split22 decimating FIR)"),
        "resource_roofline_GSps": round(flag_mxu_roof, 1),
        "fraction_of_binding_roofline": round(flag / flag_mxu_roof, 3),
        "hbm_roofline_GSps": round(flag_hbm_roof, 1),
        "fraction_of_hbm_roofline": round(flag / flag_hbm_roof, 3),
        "evidence": (
            "ablations (round 5): no-atan2 variant identical (not "
            "VPU-bound); DMA-only variant ~4.5x faster (not HBM-bound); "
            "all-bf16-DEFAULT variant only 1.2x faster with 0.32 rel "
            "err (MXU emulation passes bind, and exactness next to the "
            "atan2 branch cuts is load-bearing)"),
        "gap_accounting": (
            "stage timing (scratch/wbfm_proto.py ablations): the exact "
            "deinterleave stage alone sustains ~51% of the bf16 matmul "
            "rate (K=256 small-K passes), the FIR stage ~35% incl. "
            "frame construction; the compound kernel lands at stage "
            "utilization x stage mixing.  K-stacking the 3 passes into "
            "one K=768 matmul and an aligned two-matmul FIR were both "
            "tried and did not beat this (sel3cat/fir2 variants)"),
    }]

    pll = measure_pll_noise(jax)
    # scalar-core cycles per sample at ~0.94 GHz sparse-core clock is not
    # directly knowable; report the latency-chain accounting instead
    rows.append({
        "name": "PLL sequential tier (noise input)",
        "measured_MSps": round(pll, 1),
        "binding_resource": (
            "scalar-core dependency-chain latency: ~8 chained ops/sample "
            "(int32-turn phases; wraps are free integer overflow)"),
        "note": (
            "not a throughput resource: the per-sample feedback loop is "
            "latency-bound; locked (1008 MS/s) and acquiring (408 MS/s) "
            "tiers bypass it via the linear / overlap paths "
            "(BENCH_BLOCKS PLL rows)"),
    })

    rows.append({
        "name": "file_resident rx_wbfm (bench.py file_resident row)",
        "binding_resource": (
            "same fused XLA chain as the runner row plus the in-graph "
            "ring window slice; the runner row itself runs the XLA "
            "block path (selection deinterleave + HIGHEST conv), not "
            "the hand-fused kernel"),
        "note": (
            "round-5 fixes: window start carried as device state "
            "(a numpy scalar arg cost ~0.5 ms/dispatch of tunnel "
            "transfer), ring pre-decoded to complex at setup, "
            "prefetch thread bypassed, fence-dominated trial "
            "calibration corrected; 5.5 -> ~8.4 GS/s, ~66% of the raw "
            "kernel step and ~75% of the sourceless runner row"),
    })

    out = {
        "hardware_measured": hw,
        "rows": rows,
        "method": (
            "hardware rates from Pallas probes on THIS chip (not "
            "datasheet numbers); per-row binding resource identified by "
            "kernel ablation; fractions are measured-rate / "
            "measured-resource-roofline"),
    }
    print(json.dumps(out, indent=1))
    tag = os.environ.get("LUARADIO_TPU_ROUND", "r05")
    with open(os.path.join(REPO, f"ROOFLINE_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
