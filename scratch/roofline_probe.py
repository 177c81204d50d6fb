"""Roofline probes: achievable HBM bandwidth, VPU atan2 rate, and
wbfm_pallas time attribution (DMA vs deinterleave vs atan2 vs FIR).

Each probe is a Pallas kernel timed by chained dispatch + single scalar
fetch (the tunneled-transport methodology from bench.py).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

C, T = 8, 1 << 22          # flagship shape: [8, 2T] f32 in
TILE = 1 << 14


def timeit(fn, args, iters=None, target_s=2.0):
    out = fn(*args)
    jax.block_until_ready(out)
    # fence via tiny fetch
    def fence(o):
        leaves = jax.tree.leaves(o)
        return float(jnp.real(leaves[0].reshape(-1)[0]))
    fence(out)
    t0 = time.perf_counter()
    fn(*args); fence(fn(*args))
    dt2 = (time.perf_counter() - t0) / 2
    k = iters or max(4, int(target_s / max(dt2, 1e-5)))
    k = min(k, 512)
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / k


# --- 1) HBM copy bandwidth: tiled [C, 2T] f32 copy --------------------------

def copy_kernel(tile, x_ref, o_ref, xw, sem, sem2):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(i * tile, tile)], xw, sem)
    cp.start(); cp.wait()
    o_ref[:, :] = xw[:, :]


def make_copy(tile=2 * TILE):
    kern = functools.partial(copy_kernel, tile)
    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern, grid=(2 * T // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((C, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, 2 * T), jnp.float32),
            scratch_shapes=[pltpu.VMEM((C, tile), jnp.float32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(x)
    return run


# --- 1b) HBM copy, DOUBLE-buffered manual DMA -------------------------------

def copy2_kernel(tile, n, x_ref, o_ref, xw, sems):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(0, tile)],
                                   xw.at[0], sems.at[0])
        cp.start()

    @pl.when(i + 1 < n)
    def _():
        cp = pltpu.make_async_copy(
            x_ref.at[:, pl.ds((i + 1) * tile, tile)],
            xw.at[(i + 1) % 2], sems.at[(i + 1) % 2])
        cp.start()

    pltpu.make_async_copy(x_ref.at[:, pl.ds(i * tile, tile)],
                          xw.at[i % 2], sems.at[i % 2]).wait()
    o_ref[:, :] = xw[i % 2]


def make_copy2(tile=2 * TILE):
    n = 2 * T // tile
    kern = functools.partial(copy2_kernel, tile, n)
    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern, grid=(n,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((C, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, 2 * T), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, C, tile), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        )(x)
    return run


# --- 2) in-kernel atan2 rate: read tile, atan2, write -----------------------

def atan2_kernel(tile, x_ref, o_ref, xw, sem):
    from luaradio_tpu.ops.pll import _atan2
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(i * tile, tile)], xw, sem)
    cp.start(); cp.wait()
    a = xw[:, :tile // 2]
    b = xw[:, tile // 2:]
    o_ref[:, :] = _atan2(a, b)


def make_atan2(tile=2 * TILE):
    kern = functools.partial(atan2_kernel, tile)
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
    return run


# --- 3) flagship kernel + ablations ----------------------------------------

def run_flagship(x, taps, variant):
    from luaradio_tpu.ops import wbfm_pallas as wp
    import luaradio_tpu.ops.pll as pllmod
    if variant == "no_atan2":
        orig = pllmod._atan2
        pllmod._atan2 = lambda y, x: y * x
    try:
        fused = wp.make_wbfm_pallas(taps, 8, 1.0, tile=TILE)
        f = jax.jit(fused)
        carry = jnp.zeros((C, 2 * len(taps)), jnp.float32)
        dt = timeit(lambda xx: f(carry, xx)[1], (x,))
    finally:
        if variant == "no_atan2":
            pllmod._atan2 = orig
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, 2 * T)).astype(np.float32))
    taps = rng.standard_normal(128).astype(np.float32)
    res = {}
    nbytes_io = C * 2 * T * 4

    dt = timeit(make_copy(), (x,))
    res["copy_serial_dma_GBps"] = nbytes_io * 2 / dt / 1e9
    dt = timeit(make_copy2(), (x,))
    res["copy_double_buffered_GBps"] = nbytes_io * 2 / dt / 1e9

    dt = timeit(make_atan2(), (x,))
    res["atan2_GSps"] = C * T / dt / 1e9          # atan2 outputs/s
    res["atan2_io_GBps"] = (nbytes_io + nbytes_io // 2) / dt / 1e9

    for variant in ("full", "no_atan2"):
        dt = run_flagship(x, taps, variant)
        res[f"wbfm_{variant}_GSps"] = C * T / dt / 1e9
        res[f"wbfm_{variant}_read_GBps"] = nbytes_io / dt / 1e9
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
