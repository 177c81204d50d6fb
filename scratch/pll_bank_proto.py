"""Prototype: R independent PLL streams interleaved in one Pallas scalar
core — do the dependency chains pipeline (aggregate ~R x single)?"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

_PI = np.float32(np.pi)
_TWO_PI = np.float32(2 * np.pi)
_K = 256


def _bank_kernel(alpha, beta, fmin, fmax, mult, k, r, unroll,
                 state_ref, th_ref, phim_ref, err_ref, state_out_ref,
                 carry_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for j in range(2):
            for c in range(r):
                p = state_ref[j, c]
                p = p - _TWO_PI * jnp.round(p / _TWO_PI)
                carry_ref[j, c] = p
        for c in range(r):
            carry_ref[2, c] = state_ref[2, c]

    def body(i, carry):
        out = []
        for c in range(r):
            phi_l, phi_m, freq = carry[3 * c:3 * c + 3]
            th = th_ref[2 * c, i]
            zero = th_ref[2 * c + 1, i]
            phim_ref[c, i] = phi_m
            d = th - phi_l
            d = d - jnp.where(d > _PI, _TWO_PI, np.float32(0.0))
            d = d + jnp.where(d <= -_PI, _TWO_PI, np.float32(0.0))
            err = jnp.where(zero > 0, np.float32(0.0), d)
            err_ref[c, i] = err
            f1 = freq + beta * err
            phi_l = phi_l + f1 + alpha * err
            phi_l = phi_l - jnp.where(phi_l > _PI, _TWO_PI, np.float32(0.0))
            phi_l = phi_l + jnp.where(phi_l <= -_PI, _TWO_PI,
                                      np.float32(0.0))
            phi_m = phi_m + f1 * mult + alpha * err
            phi_m = phi_m - _TWO_PI * jnp.round(phi_m / _TWO_PI)
            freq = jnp.clip(f1, fmin, fmax)
            out.extend([phi_l, phi_m, freq])
        return tuple(out)

    init = tuple(carry_ref[j, c] for c in range(r) for j in range(3))
    final = lax.fori_loop(0, k, body, init, unroll=unroll)
    for c in range(r):
        for j in range(3):
            carry_ref[j, c] = final[3 * c + j]
            state_out_ref[j, c] = final[3 * c + j]


def pll_bank(th, state, alpha, beta, fmin, fmax, mult):
    """th [2R, N] (theta,zero rows per stream), state [3, R]."""
    r = th.shape[0] // 2
    n = th.shape[-1]
    k = _K if n % _K == 0 and n >= _K else n
    grid = (n // k,)
    kern = partial(_bank_kernel, np.float32(alpha), np.float32(beta),
                   np.float32(fmin), np.float32(fmax), np.float32(mult),
                   k, r, k)
    phim, err, st = pl.pallas_call(
        kern, grid=grid,
        out_shape=(jax.ShapeDtypeStruct((r, n), jnp.float32),
                   jax.ShapeDtypeStruct((r, n), jnp.float32),
                   jax.ShapeDtypeStruct((3, r), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((2 * r, k), lambda i: (0, i),
                               memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((r, k), lambda i: (0, i),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((r, k), lambda i: (0, i),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.SMEM((3, 16), jnp.float32)],
    )(state, th)
    return phim, err, st


def main():
    rng = np.random.default_rng(0)
    n = 1 << 18
    from luaradio_tpu.ops.pll import pll_pallas
    xp = rng.standard_normal((2, n)).astype(np.float32)
    st = jnp.zeros((3,), jnp.float32)
    f = jax.jit(lambda xp, st: pll_pallas(xp, st, 0.03, 0.002, -0.1, 0.1,
                                          1.0, interpret=False))
    o = f(xp, st); jax.block_until_ready(o); float(o[2][0])
    t0 = time.perf_counter()
    K = 20
    for _ in range(K):
        o = f(xp, st)
    float(o[2][0])
    dt = (time.perf_counter() - t0) / K
    print(f"single: {n/dt/1e6:.1f} MS/s")

    for r in (2, 4, 8):
        th = rng.standard_normal((2 * r, n)).astype(np.float32)
        # zero flags rows odd: set to 0
        th[1::2] = 0.0
        stb = jnp.zeros((3, r), jnp.float32)
        g = jax.jit(lambda th, stb: pll_bank(th, stb, 0.03, 0.002,
                                             -0.1, 0.1, 1.0))
        o = g(th, stb); jax.block_until_ready(o); float(o[2][0, 0])
        t0 = time.perf_counter()
        for _ in range(K):
            o = g(th, stb)
        float(o[2][0, 0])
        dt = (time.perf_counter() - t0) / K
        print(f"bank r={r}: aggregate {r*n/dt/1e6:.1f} MS/s "
              f"({n/dt/1e6:.1f} per stream)")


if __name__ == "__main__":
    main()
