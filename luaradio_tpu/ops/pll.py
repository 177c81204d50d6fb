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
* the loop carries phases and advances them per the reference's
  loop-filter ordering (``err = wrap(theta - phi_l)`` equals
  arg(x * conj(e^{j phi_l})), the reference's detector,
  pll.lua:149-163);
* the output oscillator never feeds back, so the loop only RECORDS
  phi_mult per sample; ``out = e^{j phi_m}`` is reconstructed on the VPU.

Round-5 redesign: phases live as **int32 turns** (2^32 = 2*pi), so every
phase wrap is free integer overflow — the explicit compare/select wrap
chains were ~40% of the latency-bound dependency chain.  The loop-filter
state is pre-scaled to turn units so the radian<->turn conversions fold
into trace-time constants; the only in-loop conversions are one
int->float (the detector difference) and one float->int round (the phase
increment).  Phase resolution 2*pi*2^-32 ~ 1.5e-9 rad — finer than the
float32 wrapped-phase representation it replaces; measured 42 -> 61 MS/s
on the noise-driven sequential tier (v5e).

Zero samples follow the reference's arg(0) = 0 convention (err = 0 — the
float64 oracle in tests/blocks/test_pll_overlap.py uses the same).

Layout: complex streams enter as float32 [2, N] (re, im rows) — the same
real-pair boundary convention as ops.complexutil.  State is (phi_locked,
phi_multiplied, freq_locked) as a float32 [3] vector (radians at the
boundary; turns inside).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K = 512  # samples per grid block (fully unrolled in the kernel)

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


_TO_F = np.float32(2 * np.pi / 4294967296.0)    # int turns -> radians
_TO_I = np.float32(4294967296.0 / (2 * np.pi))  # radians -> int turns


def _pll_phase_kernel(alpha, beta, fmin, fmax, mult, k, unroll,
                      state_ref, th_ref, phim_ref, err_ref, state_out_ref,
                      icarry_ref, fcarry_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        # locked phase + frequency (radians) -> int32 / float turns
        icarry_ref[0] = jnp.round(state_ref[0] * _TO_I).astype(jnp.int32)
        icarry_ref[1] = jnp.round(state_ref[2] * _TO_I).astype(jnp.int32)
        # output oscillator phase: int32 turns for integer multipliers
        # (advanced by an exact int multiply of the locked increment);
        # float RADIANS otherwise — a fractional mult*f1 can exceed
        # pi/sample and must alias mod 2*pi
        p = state_ref[1]
        icarry_ref[2] = jnp.round(
            (p - _TWO_PI * jnp.round(p / _TWO_PI)) * _TO_I
        ).astype(jnp.int32)
        fcarry_ref[0] = p - _TWO_PI * jnp.round(p / _TWO_PI)

    # The LOCKED-loop chain is pre-scaled to turn units (fk = freq * TO_I,
    # float for the clip); the radian<->turn factors fold into constants:
    #   (f1 + alpha*err)*TO_I  = fk + (alpha+beta)*d
    #   (freq + beta*err)*TO_I = fk + beta*d
    # with d the raw int-turn detector difference.
    k_ab = np.float32(alpha + beta)
    k_amb = np.float32(alpha + mult * beta)      # radian-domain, phi_m
    k_fm = _TO_F * np.float32(mult)              # fk -> mult*freq radians
    k_b = np.float32(beta)
    fmin_k = np.float32(fmin) * _TO_I
    fmax_k = np.float32(fmax) * _TO_I

    int_mult = float(mult).is_integer()
    mult_i = np.int32(int(mult)) if int_mult else None
    # integer mult: inc_m = mult*inc_l - (mult-1)*alpha*err, so the
    # multiplied phase advances by an exact int32 multiply of the locked
    # increment (wraps mod 2^32 = mod 2*pi, immune to mult*f1 > pi) plus
    # a small correction round
    k_corr = np.float32((mult - 1.0) * alpha) if int_mult else None

    def body(i, carry):
        phi_l, phi_m, fk = carry
        th = th_ref[0, i]
        zero = th_ref[1, i]
        if int_mult:
            phim_ref[0, i] = phi_m.astype(jnp.float32) * _TO_F
        else:
            phim_ref[0, i] = phi_m      # oscillator BEFORE this update
        # phase detector: int32 subtraction wraps for free
        d = th - phi_l
        d_f = jnp.where(zero > 0, np.float32(0.0), d.astype(jnp.float32))
        err_ref[0, i] = d_f * _TO_F
        # loop filter (reference pll.lua:149-163 ordering: phases advance
        # with the PRE-clamp frequency).  The f32->i32 convert TRUNCATES
        # (saves the round on the latency chain): the <=1-turn-unit
        # (7e-10 rad) per-step bias is absorbed by the loop feedback,
        # and phi_m integrates mult x the same corrected sequence.
        inc_l = (fk + k_ab * d_f).astype(jnp.int32)
        phi_l = phi_l + inc_l
        if int_mult:
            phi_m = phi_m + mult_i * inc_l \
                - (k_corr * d_f).astype(jnp.int32)
        else:
            # fractional mult: float radians (mult*f1 may exceed pi and
            # must alias mod 2*pi, which int turns cannot express here)
            phi_m = phi_m + fk * k_fm + k_amb * (d_f * _TO_F)
            phi_m = phi_m - _TWO_PI * jnp.round(phi_m / _TWO_PI)
        fk = jnp.clip(fk + k_b * d_f, fmin_k, fmax_k)
        return (phi_l, phi_m, fk)

    if int_mult:
        pm0 = icarry_ref[2]
    else:
        pm0 = fcarry_ref[0]
    init = (icarry_ref[0], pm0, icarry_ref[1].astype(jnp.float32))
    final = lax.fori_loop(0, k, body, init, unroll=unroll)
    icarry_ref[0] = final[0]
    if int_mult:
        icarry_ref[2] = final[1]
        state_out_ref[1] = final[1].astype(jnp.float32) * _TO_F
    else:
        fcarry_ref[0] = final[1]
        state_out_ref[1] = final[1]
    icarry_ref[1] = jnp.round(final[2]).astype(jnp.int32)
    state_out_ref[0] = final[0].astype(jnp.float32) * _TO_F
    state_out_ref[2] = final[2] * _TO_F


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

    # VPU precompute: principal angle as int32 turns + exact-zero flag.
    # The clip keeps the +pi boundary inside int32 (the f32 angle only
    # carries 24 mantissa bits there anyway).
    theta = jnp.arctan2(x_pair[1], x_pair[0])
    ti = jnp.round(jnp.clip(theta * _TO_I, np.float32(-2147483648.0),
                            np.float32(2147483392.0))).astype(jnp.int32)
    zero = jnp.logical_and(x_pair[0] == 0, x_pair[1] == 0)
    th = jnp.stack([ti, zero.astype(jnp.int32)])

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
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32),
                        pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(state, th)

    # VPU reconstruction: the recorded (wrapped) output phases -> phasors
    out = jnp.concatenate([jnp.cos(phim), jnp.sin(phim)], axis=0)
    return out, err, new_state


__all__ = ["pll_pallas"]
