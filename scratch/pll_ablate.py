"""Ablate the PLL Pallas kernel body to find the cycle budget:
  full      — current kernel
  no-osc    — output oscillator removed (phi_m scalar accumulate only)
  no-atan   — atan2 replaced by its input product (not semantically valid,
              just a cost probe)
  bare      — detector+filter only
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from luaradio_tpu.ops.pll import _atan2, _sincos_small, pll_pallas

_K = 128


def make_kernel(variant):
    def kern(alpha, beta, fmin, fmax, mult, k,
             state_ref, x_ref, err_ref, state_out_ref, carry_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            carry_ref[0] = jnp.cos(state_ref[0])
            carry_ref[1] = jnp.sin(state_ref[0])
            carry_ref[2] = state_ref[1]      # phi_m scalar
            carry_ref[3] = state_ref[2]      # freq

        def body(i, carry):
            vr, vi, phim, freq = carry
            xr = x_ref[0, i]
            xi = x_ref[1, i]
            pr = xr * vr + xi * vi
            pi_ = xi * vr - xr * vi
            if variant in ("full", "no-osc"):
                err = _atan2(pi_, pr)
            else:
                err = pi_ * pr * np.float32(1e-3)
            err_ref[0, i] = err
            freq = freq + beta * err
            dl = freq + alpha * err
            if variant != "bare":
                sl, cl = _sincos_small(dl)
                vr2 = vr * cl - vi * sl
                vi2 = vr * sl + vi * cl
                gv = np.float32(1.5) - np.float32(0.5) * (vr2 * vr2 + vi2 * vi2)
                vr, vi = vr2 * gv, vi2 * gv
            dm = freq * mult + alpha * err
            phim = phim + dm
            phim = phim - jnp.where(phim > np.float32(2 * np.pi),
                                    np.float32(2 * np.pi),
                                    np.float32(0.0))
            freq = jnp.clip(freq, fmin, fmax)
            return (vr, vi, phim, freq)

        final = lax.fori_loop(0, k, body,
                              (carry_ref[0], carry_ref[1], carry_ref[2],
                               carry_ref[3]), unroll=k)
        for j in range(4):
            carry_ref[j] = final[j]
        state_out_ref[0] = _atan2(final[1], final[0])
        state_out_ref[1] = final[2]
        state_out_ref[2] = final[3]
    return kern


def run_variant(variant, x_pair, state, n):
    k = _K
    kernel = partial(make_kernel(variant), np.float32(0.01),
                     np.float32(1e-4), np.float32(-1.0), np.float32(1.0),
                     np.float32(1.0), k)
    f = pl.pallas_call(
        kernel, grid=(n // k,),
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((3,), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((2, k), lambda i: (0, i),
                               memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((1, k), lambda i: (0, i),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
        interpret=False)
    jf = jax.jit(lambda s, x: f(s, x))
    r = jf(state, x_pair)
    np.asarray(r[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            r = jf(state, x_pair)
        np.asarray(r[1])
        best = min(best, (time.perf_counter() - t0) / 4)
    return n / best / 1e6


n = 1 << 21
rng = np.random.default_rng(0)
x = rng.standard_normal((2, n)).astype(np.float32)
state = np.zeros(3, np.float32)

# reference: the shipped kernel
out, err, st = pll_pallas(jnp.asarray(x), jnp.asarray(state),
                          0.01, 1e-4, -1.0, 1.0, 1.0, interpret=False)
np.asarray(st)
jf = jax.jit(lambda s, xx: pll_pallas(xx, s, 0.01, 1e-4, -1.0, 1.0, 1.0,
                                      interpret=False))
r = jf(jnp.asarray(state), jnp.asarray(x)); np.asarray(r[2])
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(4):
        r = jf(jnp.asarray(state), jnp.asarray(x))
    np.asarray(r[2])
    best = min(best, (time.perf_counter() - t0) / 4)
print(f"shipped: {n/best/1e6:.1f} MS/s", flush=True)

for v in ("full", "no-osc", "no-atan", "bare"):
    print(f"{v:8s}: {run_variant(v, x, state, n):.1f} MS/s", flush=True)
