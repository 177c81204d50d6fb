"""Prototype: int32-phase PLL scalar kernel — phases as int32 turns so
every wrap is free integer overflow, shortening the latency-bound chain.
Compare speed + trajectory vs the shipped float-phase kernel."""
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

_K = 256
_TO_F = np.float32(2 * np.pi / 4294967296.0)   # int turns -> radians
_TO_I = np.float32(4294967296.0 / (2 * np.pi))  # radians -> int turns
_TWO_PI = np.float32(2 * np.pi)


def _kernel(alpha, beta, fmin, fmax, mult, k, unroll,
            state_ref, th_ref, phim_ref, err_ref, state_out_ref, carry_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        # incoming phases (radians, already wrapped) -> int32 turns
        for j in range(2):
            p = state_ref[j] * _TO_I
            carry_ref[j] = jnp.round(p).astype(jnp.int32)
        carry_ref[2] = jnp.round(state_ref[2] * _TO_I).astype(jnp.int32)

    # all loop-filter state pre-scaled to int-turn units: fK = freq*TO_I
    # (float), err handled as raw int-turn difference; unit conversions
    # fold into the constants, off the dependency chain
    k_ab = np.float32((alpha + beta))
    k_b = np.float32(beta)

    def body(i, carry):
        phi_l, phi_m, fk = carry
        th = th_ref[0, i]
        zero = th_ref[1, i]
        phim_ref[0, i] = phi_m.astype(jnp.float32) * _TO_F
        d = th - phi_l                       # wrap-free detector
        d_f = jnp.where(zero > 0, np.float32(0.0), d.astype(jnp.float32))
        err_ref[0, i] = d_f * _TO_F
        # phase update in int-turn units: (f1 + alpha*err)*TO_I
        #   = fK + (alpha+beta)*d_f
        phi_l = phi_l + jnp.round(fk + k_ab * d_f).astype(jnp.int32)
        phi_m = phi_m + jnp.round(fk * mult
                                  + (k_ab + (mult - 1) * k_b) * d_f
                                  ).astype(jnp.int32)
        fk = jnp.clip(fk + k_b * d_f, fmin * _TO_I, fmax * _TO_I)
        return (phi_l, phi_m, fk)

    init = (carry_ref[0], carry_ref[1],
            carry_ref[2].astype(jnp.float32))
    final = lax.fori_loop(0, k, body, init, unroll=unroll)
    carry_ref[0] = final[0]
    carry_ref[1] = final[1]
    carry_ref[2] = jnp.round(final[2]).astype(jnp.int32)
    state_out_ref[0] = final[0].astype(jnp.float32) * _TO_F
    state_out_ref[1] = final[1].astype(jnp.float32) * _TO_F
    state_out_ref[2] = final[2] * _TO_F


def pll_int(x_pair, state, alpha, beta, fmin, fmax, mult):
    n = x_pair.shape[-1]
    k = _K if n % _K == 0 and n >= _K else n
    grid = (n // k,)
    theta = jnp.arctan2(x_pair[1], x_pair[0])
    ti = jnp.round(jnp.clip(theta * _TO_I, -2147483648.0, 2147483392.0)
                   ).astype(jnp.int32)
    zero = jnp.logical_and(x_pair[0] == 0, x_pair[1] == 0)
    th = jnp.stack([ti, zero.astype(jnp.int32)])
    kernel = partial(_kernel, np.float32(alpha), np.float32(beta),
                     np.float32(fmin), np.float32(fmax), np.float32(mult),
                     k, k)
    phim, err, st = pl.pallas_call(
        kernel, grid=grid,
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((3,), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((2, k), lambda i: (0, i),
                               memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((1, k), lambda i: (0, i),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, k), lambda i: (0, i),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
    )(state, th)
    out = jnp.concatenate([jnp.cos(phim), jnp.sin(phim)], axis=0)
    return out, err, st


def main():
    from luaradio_tpu.ops.pll import pll_pallas
    n = 1 << 22
    rng = np.random.default_rng(0)
    # noise input (the sequential tier's case)
    xp = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    st0 = jnp.zeros((3,), jnp.float32)
    args = (0.0166, 0.000139, -0.1, 0.1, 1.0)

    fref = jax.jit(lambda x, s: pll_pallas(x, s, *args, interpret=False))
    fint = jax.jit(lambda x, s: pll_int(x, s, *args))

    for name, f in (("float-phase", fref), ("int32-phase", fint)):
        st = st0
        out, err, st = f(xp, st); float(st[0])
        t0 = time.perf_counter()
        K = 8
        for _ in range(K):
            out, err, st = f(xp, st)
        float(st[0])
        dt = (time.perf_counter() - t0) / K
        print(f"{name}: {n/dt/1e6:.1f} MS/s")

    # accuracy on a LOCKED tone (the regime where trajectories compare)
    m = 1 << 18
    t = np.arange(m)
    tone = np.exp(1j * (0.05 * t + 0.3)).astype(np.complex64)
    tp = jnp.asarray(
        np.stack([tone.real, tone.imag]).astype(np.float32))
    argt = (0.0166, 0.000139, 0.03, 0.07, 1.0)
    o1, e1, s1 = jax.jit(lambda x, s: pll_pallas(x, s, *argt,
                                                 interpret=False))(tp, st0)
    o2, e2, s2 = jax.jit(lambda x, s: pll_int(x, s, *argt))(tp, st0)
    o1, o2 = np.asarray(o1), np.asarray(o2)
    e1, e2 = np.asarray(e1), np.asarray(e2)
    print("locked tone: max |out diff|", np.max(np.abs(o1 - o2)),
          " max |err diff|", np.max(np.abs(e1 - e2)),
          " state diff", np.asarray(s1) - np.asarray(s2))


if __name__ == "__main__":
    main()
