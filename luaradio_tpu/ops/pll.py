"""Pallas PLL kernel.

The PLL is the reference's slowest kernel (5.5 MS/s on an i5 — BASELINE.md)
because it is a true per-sample nonlinear feedback loop.  The portable
implementation (blocks/signal/carrier.py) uses lax.scan; this module
provides a Pallas TPU kernel that runs the loop on-core: the grid walks
K-sample blocks, samples stream through SMEM blocks (scalar core), and the
oscillator state persists across grid steps in SMEM scratch — no per-step
XLA loop machinery, one pass over the data.

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

_K = 128  # samples per grid block (fully unrolled in the kernel)


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


def _pll_kernel(alpha, beta, fmin, fmax, mult, k,
                state_ref, x_ref, out_ref, err_ref, state_out_ref, carry_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        # carry: VCO and output oscillators as unit phasors + frequency
        carry_ref[0] = jnp.cos(state_ref[0])
        carry_ref[1] = jnp.sin(state_ref[0])
        carry_ref[2] = jnp.cos(state_ref[1])
        carry_ref[3] = jnp.sin(state_ref[1])
        carry_ref[4] = state_ref[2]

    def body(i, carry):
        vr, vi, mr, mi, freq = carry
        xr = x_ref[0, i]
        xi = x_ref[1, i]
        out_ref[0, i] = mr
        out_ref[1, i] = mi
        # phase detector: arg(x * conj(vco))
        pr = xr * vr + xi * vi
        pi_ = xi * vr - xr * vi
        err = _atan2(pi_, pr)
        err_ref[0, i] = err
        # loop filter (reference pll.lua:149-163 ordering); the phase
        # accumulators become incremental complex rotations, with a Newton
        # renormalization step absorbing float drift (the loop feedback
        # corrects any residual VCO phase error).
        freq = freq + beta * err
        dl = freq + alpha * err
        dm = freq * mult + alpha * err
        sl, cl = _sincos_small(dl)
        sm, cm = _sincos_small(dm)
        vr2 = vr * cl - vi * sl
        vi2 = vr * sl + vi * cl
        mr2 = mr * cm - mi * sm
        mi2 = mr * sm + mi * cm
        gv = np.float32(1.5) - np.float32(0.5) * (vr2 * vr2 + vi2 * vi2)
        gm = np.float32(1.5) - np.float32(0.5) * (mr2 * mr2 + mi2 * mi2)
        freq = jnp.clip(freq, fmin, fmax)
        return (vr2 * gv, vi2 * gv, mr2 * gm, mi2 * gm, freq)

    final = lax.fori_loop(
        0, k, body, (carry_ref[0], carry_ref[1], carry_ref[2], carry_ref[3],
                     carry_ref[4]), unroll=k)
    for j in range(5):
        carry_ref[j] = final[j]
    state_out_ref[0] = _atan2(final[1], final[0])
    state_out_ref[1] = _atan2(final[3], final[2])
    state_out_ref[2] = final[4]


def pll_pallas(x_pair: jnp.ndarray, state: jnp.ndarray, alpha, beta,
               fmin, fmax, mult, interpret: bool | None = None):
    """Run the PLL over x_pair [2, N] float32 with state [3] float32.

    Returns (out_pair [2, N], err [1, N], new_state [3]).  When N is a
    multiple of the internal block size (``_K`` = 128) the grid walks
    N/_K blocks with the loop fully unrolled per block; otherwise the
    whole chunk runs as one grid step (correct, but compile time grows
    with N — the graph planner's chunk sizes are powers of two, so the
    blocked path is the one that runs in practice).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = x_pair.shape[-1]
    k = _K if n % _K == 0 and n >= _K else n
    grid = (n // k,)
    kernel = partial(_pll_kernel, np.float32(alpha), np.float32(beta),
                     np.float32(fmin), np.float32(fmax), np.float32(mult), k)
    out, err, new_state = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((2, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((3,), jnp.float32)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, k), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, k), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.SMEM((5,), jnp.float32)],
        interpret=interpret,
    )(state, x_pair)
    return out, err, new_state


__all__ = ["pll_pallas"]
