"""Parallel-in-time PLL: the locked loop as a guarded linear scan.

The reference PLL (pll.lua:138-167) is a per-sample nonlinear feedback
loop — its slowest kernel (5.5 MS/s on an i5, BASELINE.md) and the main
TPU vectorization challenge (SURVEY §7a).  The sequential Pallas kernel
(ops/pll.py) runs it on the scalar core at ~6 MS/s — near that core's
speed of light.  This module breaks the sequential bottleneck by solving
the loop *in parallel* when it is locked, which is the steady state of
every real receiver:

The loop's only nonlinearities are (1) the phase-detector wrap
``err = wrap(theta - phi)`` and (2) the frequency clamp.  While
``|err| < pi`` and the clamp is inactive — i.e. in lock — the recurrence
is EXACTLY linear in (phi, freq):

    err[n]  = theta_u[n] - phi[n]          (theta_u: unwrapped input phase)
    freq'   = freq + beta * err
    phi'    = phi + freq' + alpha * err

a 2-state affine recurrence s' = A s + b * theta_u.  Because the loop is
type-2, its particular response to the linear trend of theta_u is the
trend itself with zero error, so after detrending (theta_u = c0 + c1 n +
tau, tau small) only the residual drives the system:

    s_h[n+1] = A s_h[n] + b tau[n]

which diagonalizes into two first-order complex recurrences solved with
the associative scan (ops/scan.py) — O(log N) depth, VPU-parallel.

Large-phase precision is never needed: every output is composed from unit
phasors of the *wrapped* input phase (x / |x|) times rotations by small
quantities (err, freq, alpha/beta sums), so nothing above ~|tau| radians
is ever represented in float32.  The multiplied oscillator uses
x-hat^multiplier (integer multipliers only — de Moivre on the wrapped
phase).

Validity is checked *after the fact* on the linear solution: max|err|
< pi (wrap identity), freq excursion inside [fmin, fmax] (clamp
inactive), and |tau| bounded (float32 headroom).  If any guard fails —
acquisition, lost lock, clamp railing — ``lax.cond`` reruns the chunk
through the exact sequential kernel.  A receiver pays the sequential
price for the acquisition chunk(s) and then streams at VPU speed.

By induction the linear solution equals the sequential loop exactly
(modulo float rounding): if phi matches at sample n and |err[n]| < pi,
the wrapped and unwrapped error coincide, so the updates coincide at
n+1; the reference's +-2pi phase wraps only change phi by full turns,
which every phasor and wrap() is invariant to.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from luaradio_tpu.ops.scan import linrec_first_order

_TWO_PI = np.float32(2 * np.pi)
_PI = np.float32(np.pi)


def _wrap(a):
    """Wrap to (-pi, pi]."""
    return a - _TWO_PI * jnp.round(a / _TWO_PI)


def _phasor_pow(u, mult: int):
    y = u
    for _ in range(mult - 1):
        y = y * u
    return y


def pll_linear(x, state, alpha, beta, fmin, fmax, mult: int):
    """Linear-scan PLL over complex x [N] with state (phi_l, phi_m, freq).

    Returns (valid, new_state, out [N] complex64, err [N] float32): the
    locked-loop solution plus a validity flag; the caller falls back to the
    sequential kernel when ``valid`` is False (see :func:`pll_hybrid`).
    ``mult`` must be a positive integer (de Moivre phase multiplication).
    """
    alpha = np.float32(alpha)
    beta = np.float32(beta)
    p0, m0, f0 = (jnp.asarray(s, jnp.float32) for s in state)
    n = x.shape[-1]

    theta = jnp.arctan2(x.imag, x.real).astype(jnp.float32)
    mag = jnp.abs(x)
    xhat = jnp.where(mag > 0, x / jnp.maximum(mag, np.float32(1e-30)),
                     jnp.ones_like(x)).astype(jnp.complex64)

    # unwrapped input phase, detrended: theta_u[n] = p0 + c1*n + tau[n]
    d0 = _wrap(theta[0] - p0)                       # theta_u[0] - p0
    inc = _wrap(theta[1:] - theta[:-1])             # increments, n >= 1
    c1 = jnp.sum(inc) / np.float32(max(n - 1, 1))   # per-chunk trend
    tau = d0 + jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(inc - c1)])

    # homogeneous + residual-driven part: s_h[n+1] = A s_h[n] + b tau[n],
    # diagonalized offline (alpha/beta are trace-time constants)
    a_mat = np.array([[1.0 - alpha - beta, 1.0], [-beta, 1.0]], np.float64)
    lam, vmat = np.linalg.eig(a_mat.astype(np.complex128))
    vinv = np.linalg.inv(vmat)
    b_vec = np.array([alpha + beta, beta], np.complex128)
    w_in = vinv @ b_vec                              # residual injection
    z0_coef = vinv[:, 1]                             # s_h[0] = [0, f0 - c1]

    f_dev = (f0 - c1).astype(jnp.complex64)
    zs = []
    for k in range(2):
        u = jnp.asarray(np.complex64(w_in[k])) * tau.astype(jnp.complex64)
        z_init = jnp.asarray(np.complex64(z0_coef[k])) * f_dev
        zk = linrec_first_order(u, np.complex64(lam[k]), z_init)  # z[1..n]
        zs.append(jnp.concatenate([z_init[None], zk]))
    # s_h[0..n] rows
    p_h = (np.complex64(vmat[0, 0]) * zs[0]
           + np.complex64(vmat[0, 1]) * zs[1]).real.astype(jnp.float32)
    f_h = (np.complex64(vmat[1, 0]) * zs[0]
           + np.complex64(vmat[1, 1]) * zs[1]).real.astype(jnp.float32)

    err = tau - p_h[:-1]                             # e[0..n-1]
    f_new = c1 + f_h[:-1] + beta * err               # pre-clamp freq[n+1]

    # ---- guards: the linear solution is exact iff these hold -------------
    margin = np.float32(np.pi * (15.0 / 16.0))
    valid = ((jnp.max(jnp.abs(err)) < margin)
             & (jnp.max(f_new) <= np.float32(fmax))
             & (jnp.min(f_new) >= np.float32(fmin))
             & (jnp.max(jnp.abs(tau)) < np.float32(512.0)))

    # ---- outputs: unit phasors x small rotations --------------------------
    s_cum = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(err)])
    small = -np.float32(mult) * err + alpha * np.float32(1 - mult) * s_cum[:-1]
    base = lax.complex(jnp.cos(m0 - np.float32(mult) * p0),
                       jnp.sin(m0 - np.float32(mult) * p0))
    rot = lax.complex(jnp.cos(small), jnp.sin(small))
    out = (base * _phasor_pow(xhat, mult) * rot).astype(jnp.complex64)

    # ---- final state via phasor composition (no large phases) -------------
    dl = f_new[-1] + (alpha - np.float32(1.0)) * err[-1]
    vco_next = xhat[-1] * lax.complex(jnp.cos(dl), jnp.sin(dl))
    dm = np.float32(mult) * f_new[-1] + alpha * err[-1]
    osc_next = out[-1] * lax.complex(jnp.cos(dm), jnp.sin(dm))
    new_state = (jnp.arctan2(vco_next.imag, vco_next.real),
                 jnp.arctan2(osc_next.imag, osc_next.real),
                 jnp.clip(f_new[-1], np.float32(fmin), np.float32(fmax)))
    return valid, new_state, out, err


def _eigen_setup(alpha, beta):
    """Diagonalize the loop's 2x2 state matrix at trace time."""
    a_mat = np.array([[1.0 - alpha - beta, 1.0], [-beta, 1.0]], np.float64)
    lam, vmat = np.linalg.eig(a_mat.astype(np.complex128))
    vinv = np.linalg.inv(vmat)
    return lam, vmat, vinv


def pll_newton_segment(x, state, alpha, beta, fmin, fmax, mult: int,
                       iters: int = 6, tol: float = 3e-4):
    """Solve the exact nonlinear PLL recurrence on one segment in parallel
    by Newton/Picard iteration — no lock assumption.

    The loop's only nonlinearity is the wrapped phase detector
    ``err = wrap(theta - phi)``, whose derivative is 1 almost everywhere,
    so linearizing around a guess trajectory ``phi_g`` gives the SAME
    constant 2x2 affine recurrence as the locked loop, driven by the
    wrapped residual ``w = angle(x_hat * conj(u))`` and the guess
    increments.  Each iteration solves that recurrence with two log-depth
    first-order scans and rotates the guess phasors by the correction —
    the fixed point is an exact trajectory of the per-sample loop
    (pll.lua:138-167 semantics).  Validity is verified after the fact,
    elementwise and exactly: the phasor trajectory must satisfy
    ``u[n+1] = u[n]*exp(i*(f1[n] + alpha*w[n]))`` with the frequency
    rebuilt from the errors alone, and the clamp must stay inactive.
    Large phases never appear: the trajectory lives in unit phasors.

    x: [L] complex64; state (phi_l, phi_m, freq) float32 scalars.
    Returns (valid, new_state, out [L] complex64, err [L] float32).
    """
    alpha = np.float32(alpha)
    beta = np.float32(beta)
    n = x.shape[-1]
    p0, m0, f0 = (jnp.asarray(s, jnp.float32) for s in state)

    mag = jnp.abs(x)
    has = mag > 0
    xhat = jnp.where(has, x / jnp.maximum(mag, np.float32(1e-30)),
                     jnp.ones_like(x)).astype(jnp.complex64)

    lam, vmat, vinv = _eigen_setup(alpha, beta)
    w_in = vinv @ np.array([alpha + beta, beta], np.complex128)
    g_in = vinv @ np.array([-1.0, 0.0], np.complex128)
    z0_coef = vinv[:, 1]                      # s[0] = (0, f0)

    def angle(z):
        return jnp.arctan2(z.imag, z.real).astype(jnp.float32)

    def rot(a):
        return lax.complex(jnp.cos(a), jnp.sin(a))

    # guess: constant-frequency extrapolation u[n] = exp(i(p0 + f0 n)),
    # n = 0..L (one extra sample carries the segment-exit phase)
    r0 = rot(f0).astype(jnp.complex64)
    u = rot(p0).astype(jnp.complex64) * jnp.cumprod(
        jnp.concatenate([jnp.ones((1,), jnp.complex64),
                         jnp.broadcast_to(r0, (n,))]))

    f_dev = f0.astype(jnp.complex64)
    for _ in range(iters):
        w = jnp.where(has, angle(xhat * jnp.conj(u[:-1])), np.float32(0.0))
        g = angle(u[1:] * jnp.conj(u[:-1]))
        d_parts = []
        for k in range(2):
            uin = (jnp.asarray(np.complex64(w_in[k])) * w.astype(jnp.complex64)
                   + jnp.asarray(np.complex64(g_in[k]))
                   * g.astype(jnp.complex64))
            z_init = jnp.asarray(np.complex64(z0_coef[k])) * f_dev
            zk = linrec_first_order(uin, np.complex64(lam[k]), z_init)
            d_parts.append(np.complex64(vmat[0, k]) * zk)
        d = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32),
             (d_parts[0] + d_parts[1]).real.astype(jnp.float32)])
        u = u * rot(d)
        u = u * (np.float32(1.5) - np.float32(0.5)
                 * (u.real * u.real + u.imag * u.imag)).astype(jnp.complex64)

    # exact elementwise validation of the fixed point
    w = jnp.where(has, angle(xhat * jnp.conj(u[:-1])), np.float32(0.0))
    f1 = f0 + beta * jnp.cumsum(w)            # freq after update at n
    inc = f1 + alpha * w                      # phase increment at n
    resid = angle(u[1:] * jnp.conj(u[:-1]) * rot(-inc))
    valid = ((jnp.max(jnp.abs(resid)) < np.float32(tol))
             & (jnp.max(f1) <= np.float32(fmax))
             & (jnp.min(f1) >= np.float32(fmin)))

    # outputs: dphi_m = mult*inc + alpha*(1-mult)*w, composed as phasors
    s_cum = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(w)])
    base = rot(m0 - np.float32(mult) * p0)
    um = _phasor_pow(u, mult) * rot(
        alpha * np.float32(1 - mult) * s_cum).astype(jnp.complex64)
    out = (base * um[:-1]).astype(jnp.complex64)

    new_state = (angle(u[-1]), angle(base * um[-1]),
                 jnp.clip(f1[-1], np.float32(fmin), np.float32(fmax)))
    return valid, new_state, out, w


def _pow2_segment(n: int, cap: int = 1024) -> int:
    """Largest power-of-two divisor of n, capped."""
    s = 1
    while n % (s * 2) == 0 and s < cap:
        s *= 2
    return s


def pll_newton_scan(x, state, alpha, beta, fmin, fmax, mult: int, sequential,
                    seg_len: int | None = None, iters: int = 6):
    """Per-segment Newton solve with sequential fallback, scanned over the
    chunk: one unlocked or clamp-railing region only serializes its own
    segment, not the whole chunk (the round-2 hybrid re-ran entire 4M
    chunks through the sequential kernel on any guard failure).

    Convergence envelope: the Newton iteration settles only while the
    guess trajectory stays within ~1 rad of the fixed point everywhere in
    the segment — phase-step transients and small frequency errors.  Under
    large frequency pull-ins or noise the wrap branches chatter and the
    self-consistency guard rejects (by design); the overlap-and-discard
    scan (ops/pll_overlap.py) is the general unlocked-path solver, and the
    hybrid uses THAT.  This solver is kept as the exact (non-stochastic)
    alternative for callers whose transients fit the envelope."""
    n = x.shape[-1]
    if seg_len is None:
        seg_len = _pow2_segment(n)
    if seg_len < 64:
        st, (out, err) = sequential(state, x)
        return (tuple(jnp.asarray(s, jnp.float32) for s in st),
                (out.astype(jnp.complex64), err.astype(jnp.float32)))

    def body(carry, xseg):
        ok, newton_state, n_out, n_err = pll_newton_segment(
            xseg, carry, alpha, beta, fmin, fmax, mult, iters=iters)

        def _newton(_):
            return newton_state, (n_out, n_err)

        def _seq(_):
            st, (o, e) = sequential(carry, xseg)
            return (tuple(jnp.asarray(s, jnp.float32) for s in st),
                    (o.astype(jnp.complex64), e.astype(jnp.float32)))

        carry2, (o, e) = lax.cond(ok, _newton, _seq, operand=None)
        return carry2, (o, e)

    state0 = tuple(jnp.asarray(s, jnp.float32) for s in state)
    carry, (outs, errs) = lax.scan(body, state0,
                                   x.reshape(n // seg_len, seg_len))
    return carry, (outs.reshape(n), errs.reshape(n))


def pll_hybrid(x, state, alpha, beta, fmin, fmax, mult: int, sequential,
               allow_overlap: bool = True):
    """Three-tier PLL dispatch:

    1. full-chunk LINEAR solution when the loop is locked (the steady state
       of every receiver) — O(log N) depth, exact while the guards hold;
    2. OVERLAP-AND-DISCARD batched scan otherwise (acquisition, noise,
       clamp railing) — the chunk runs as concurrent warm-up-validated
       segments at full VPU width (ops/pll_overlap.py);
    3. the exact sequential kernel when the batched boundary check fails
       (e.g. loop bandwidth too narrow for the chunk's warm-up budget).

    ``sequential(state, x) -> (state', (out, err))`` is the exact kernel
    (Pallas on TPU, lax.scan on CPU).  Returns (state', (out, err)).

    ``allow_overlap=False`` disables tier 2 so every non-locked chunk runs
    the bit-exact sequential kernel (the overlap tier's accepted outputs
    are approximate within its fixed warm-up tolerances — callers needing
    exactness, e.g. PLLBlock(exact=True), force the sequential fallback).
    """
    from luaradio_tpu.ops.pll_overlap import plan_overlap, pll_overlap_discard

    valid, lin_state, lin_out, lin_err = pll_linear(
        x, state, alpha, beta, fmin, fmax, mult)

    def _linear(_):
        return lin_state, (lin_out, lin_err)

    def _seq(_):
        st, (out, err) = sequential(state, x)
        return (tuple(jnp.asarray(s, jnp.float32) for s in st),
                (out.astype(jnp.complex64), err.astype(jnp.float32)))

    plan = plan_overlap(x.shape[-1], float(alpha)) if allow_overlap else None
    if plan is None:
        return lax.cond(valid, _linear, _seq, operand=None)
    lseg, warm = plan

    def _fallback(_):
        # Cheap coherence gate: the overlap tier's boundary check can
        # only pass when the loop trajectory is input-dominated (a
        # carrier to track).  On carrier-free noise the warm-up never
        # converges (wrapped detector errors keep trajectories apart),
        # so the whole batched scan is wasted work ahead of the
        # sequential kernel — skip it when the lag-1 autocorrelation
        # says there is no carrier.  Correctness is unaffected either
        # way: the overlap result is independently validated, and the
        # gate only chooses which tiers run.
        c = jnp.sum(x[..., 1:] * jnp.conj(x[..., :-1]))
        p = jnp.sum(jnp.real(x) ** 2 + jnp.imag(x) ** 2)
        coherent = jnp.abs(c) > np.float32(0.05) * jnp.maximum(
            p, np.float32(1e-30))

        def _try_overlap(_):
            ok, b_state, b_out, b_err = pll_overlap_discard(
                x, state, alpha, beta, fmin, fmax, mult, lseg, warm)

            def _batched(_):
                return b_state, (b_out, b_err)

            return lax.cond(ok, _batched, _seq, operand=None)

        return lax.cond(coherent, _try_overlap, _seq, operand=None)

    return lax.cond(valid, _linear, _fallback, operand=None)


__all__ = ["pll_linear", "pll_hybrid", "pll_newton_segment",
           "pll_newton_scan"]
