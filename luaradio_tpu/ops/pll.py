"""Pallas PLL kernel (phase domain).

The PLL is the reference's slowest kernel (5.5 MS/s on an i5 — BASELINE.md)
because it is a true per-sample nonlinear feedback loop.  The portable
implementation (blocks/signal/carrier.py) uses lax.scan; this module
provides a Pallas TPU kernel for the sequential tier.

Round-4 redesign: the scalar core is LATENCY-bound on the loop's
dependency chain, not op count (an ablation with the transcendentals
removed ran barely faster), so the loop is reformulated in the PHASE
domain to shorten the chain:

* ``theta = arg(x)`` is precomputed for the whole chunk on the VPU
  (vectorized arctan2 — throughput is free next to the scalar loop);
* the loop carries (phi_locked, phi_mult, freq) as WRAPPED phases and
  advances them with ~9 chained scalar ops per sample:
  ``err = wrap(theta - phi_l)`` (equal to arg(x * conj(e^{j phi_l})),
  the reference's detector, pll.lua:149-163), then the loop-filter
  updates with pre-clamp frequency, exactly the reference's ordering;
* the output oscillator never feeds back, so the loop only RECORDS
  phi_mult per sample; ``out = e^{j phi_m}`` is reconstructed on the VPU.

Zero samples follow the reference's arg(0) = 0 convention (err = 0 — the
float64 oracle in tests/blocks/test_pll_overlap.py uses the same).

Layout: complex streams enter as float32 [2, N] (re, im rows) — the same
real-pair boundary convention as ops.complexutil.  State is (phi_locked,
phi_multiplied, freq_locked) as a float32 [3] vector.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K = 256  # samples per grid block (fully unrolled in the kernel)

_PI = np.float32(np.pi)
_TWO_PI = np.float32(2 * np.pi)


# ---------------------------------------------------------------------------
# Scalar-core math helpers (Mosaic has no atan/atan2 primitive).  Used by
# the fused WBFM kernel (ops/wbfm_pallas.py); the phase-domain PLL below
# no longer needs them in its loop (arg(x) moved to the VPU).
# ---------------------------------------------------------------------------


def _atan(x):
    """float32 arctan via Cephes-style range reduction + odd polynomial
    (Pallas TPU has no atan/atan2 primitive)."""
    sign = jnp.where(x < 0, np.float32(-1.0), np.float32(1.0))
    x = jnp.abs(x)
    t3p8 = np.float32(2.414213562373095)   # tan(3*pi/8)
    tp8 = np.float32(0.4142135623730950)   # tan(pi/8)
    big = x > t3p8
    mid = jnp.logical_and(x > tp8, jnp.logical_not(big))
    y = jnp.where(big, np.float32(np.pi / 2),
                  jnp.where(mid, np.float32(np.pi / 4), np.float32(0.0)))
    safe = jnp.maximum(x, np.float32(1e-30))
    xr = jnp.where(big, np.float32(-1.0) / safe,
                   jnp.where(mid, (x - np.float32(1.0)) / (x + np.float32(1.0)),
                             x))
    z = xr * xr
    p = ((np.float32(8.05374449538e-2) * z - np.float32(1.38776856032e-1))
         * z + np.float32(1.99777106478e-1)) * z - np.float32(3.33329491539e-1)
    r = xr + xr * z * p
    return sign * (y + r)


def _signbit(x):
    """IEEE sign bit incl. -0, usable in BOTH Mosaic contexts: jnp.signbit's
    bitcast lowering is vector-only, and the scalar fallback's select of
    1/(+-0) = +-inf produces an i1 vector truncation Mosaic also rejects —
    so dispatch on the trace-time rank."""
    if getattr(x, "ndim", 0) == 0:
        return jnp.where(x == 0, np.float32(1.0) / x < 0, x < 0)
    return jnp.signbit(x)


def _atan2(y, x):
    """float32 atan2 built on :func:`_atan`.

    IEEE-754 signed-zero semantics (atan2(+-0, -0) = +-pi, atan2(-0, x>0)
    = -0, atan2(-0, x<0) = -pi) are preserved so the kernel agrees bit-wise
    with XLA's arctan2 on cold-start all-zero histories, where products of
    zeros carry data-dependent signs."""
    pi = np.float32(np.pi)
    safe_x = jnp.where(x == 0, np.float32(1e-30), x)
    base = _atan(y / safe_x)
    base = jnp.where(x < 0,
                     jnp.where(_signbit(y), base - pi, base + pi), base)
    # x == 0 column: +-pi/2 by the sign of y; +-pi / +-0 for y = +-0 by
    # the sign bits of x and y
    zz = jnp.where(_signbit(x), pi, np.float32(0.0))
    zz = jnp.where(_signbit(y), -zz, zz)
    v0 = jnp.where(y > 0, np.float32(np.pi / 2),
                   jnp.where(y < 0, np.float32(-np.pi / 2), zz))
    return jnp.where(x == 0, v0, base)


def _sincos_small(d):
    """Polynomial sin/cos for the per-sample phase increments (|d| < ~1.5
    rad): keeps the hot loop free of transcendentals.  9th/8th order — the
    multiplied output phase integrates open-loop, so per-step truncation
    must stay below ~1e-9 to avoid coherent drift."""
    d2 = d * d
    s = d * (np.float32(1.0) + d2 * (np.float32(-1.0 / 6.0)
             + d2 * (np.float32(1.0 / 120.0)
             + d2 * (np.float32(-1.0 / 5040.0)
             + d2 * np.float32(1.0 / 362880.0)))))
    c = (np.float32(1.0) + d2 * (np.float32(-0.5)
         + d2 * (np.float32(1.0 / 24.0)
         + d2 * (np.float32(-1.0 / 720.0)
         + d2 * np.float32(1.0 / 40320.0)))))
    return s, c


def _pll_phase_kernel(alpha, beta, fmin, fmax, mult, k, unroll,
                      state_ref, th_ref, phim_ref, err_ref, state_out_ref,
                      carry_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        # wrap incoming phases into (-pi, pi]
        for j in range(2):
            p = state_ref[j]
            p = p - _TWO_PI * jnp.round(p / _TWO_PI)
            carry_ref[j] = p
        carry_ref[2] = state_ref[2]

    def body(i, carry):
        phi_l, phi_m, freq = carry
        th = th_ref[0, i]
        zero = th_ref[1, i]
        phim_ref[0, i] = phi_m          # oscillator BEFORE this update
        # phase detector: wrap(theta - phi_l) in (-pi, pi]
        d = th - phi_l
        d = d - jnp.where(d > _PI, _TWO_PI, np.float32(0.0))
        d = d + jnp.where(d <= -_PI, _TWO_PI, np.float32(0.0))
        err = jnp.where(zero > 0, np.float32(0.0), d)
        err_ref[0, i] = err
        # loop filter (reference pll.lua:149-163 ordering: phases advance
        # with the PRE-clamp frequency)
        f1 = freq + beta * err
        phi_l = phi_l + f1 + alpha * err
        phi_l = phi_l - jnp.where(phi_l > _PI, _TWO_PI, np.float32(0.0))
        phi_l = phi_l + jnp.where(phi_l <= -_PI, _TWO_PI, np.float32(0.0))
        phi_m = phi_m + f1 * mult + alpha * err
        phi_m = phi_m - _TWO_PI * jnp.round(phi_m / _TWO_PI)
        freq = jnp.clip(f1, fmin, fmax)
        return (phi_l, phi_m, freq)

    final = lax.fori_loop(0, k, body,
                          (carry_ref[0], carry_ref[1], carry_ref[2]),
                          unroll=unroll)
    for j in range(3):
        carry_ref[j] = final[j]
        state_out_ref[j] = final[j]


def pll_pallas(x_pair: jnp.ndarray, state: jnp.ndarray, alpha, beta,
               fmin, fmax, mult, interpret: bool | None = None):
    """Run the PLL over x_pair [2, N] float32 with state [3] float32.

    Returns (out_pair [2, N], err [1, N], new_state [3]).  When N is a
    multiple of the internal block size (``_K``) the grid walks N/_K
    blocks with the loop fully unrolled per block; otherwise the whole
    chunk runs as one grid step (correct, but compile time grows with N —
    the graph planner's chunk sizes are powers of two, so the blocked
    path is the one that runs in practice).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = x_pair.shape[-1]
    k = _K if n % _K == 0 and n >= _K else n
    grid = (n // k,)

    # VPU precompute: principal angle + exact-zero flag per sample
    theta = jnp.arctan2(x_pair[1], x_pair[0])
    zero = jnp.logical_and(x_pair[0] == 0, x_pair[1] == 0)
    th = jnp.stack([theta, zero.astype(jnp.float32)])

    # full unroll feeds the compiled scalar core; interpret mode would
    # re-evaluate the k-times-unrolled jaxpr op by op, so keep it rolled
    kernel = partial(_pll_phase_kernel, np.float32(alpha), np.float32(beta),
                     np.float32(fmin), np.float32(fmax), np.float32(mult), k,
                     1 if interpret else k)
    phim, err, new_state = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((3,), jnp.float32)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, k), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.SMEM((3,), jnp.float32)],
        interpret=interpret,
    )(state, th)

    # VPU reconstruction: the recorded (wrapped) output phases -> phasors
    out = jnp.concatenate([jnp.cos(phim), jnp.sin(phim)], axis=0)
    return out, err, new_state


__all__ = ["pll_pallas"]
