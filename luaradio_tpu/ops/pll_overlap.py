"""Overlap-and-discard batched PLL: parallel-in-time execution of the
UNLOCKED loop.

The locked loop is exactly linear and solved in closed form
(ops/pll_linear.py).  Acquiring, noise-driven, or clamp-railing chunks have
no linear structure — but the loop is *contractive*: both eigenvalues of
its small-signal state matrix have |lambda| ~ 1 - alpha/2, so the state
forgets its initial condition at e^(-alpha/2) per sample.  That is the same
structural property overlap-save exploits for FIR filters, applied to a
nonlinear feedback loop:

* split the chunk into S segments of L samples;
* run ALL segments concurrently as one short `lax.scan` over W+L steps
  with [S]-wide vector state (full VPU lanes instead of one scalar loop —
  the reference's per-sample loop shape, pll.lua:138-167, vectorized over
  segments instead of samples);
* each segment starts W samples early inside its left neighbor's data,
  from a guessed state; after the W warm-up samples the guess is forgotten
  to ~e^(-W*alpha/2) and the warm-up outputs are discarded;
* exactness is CHECKED, not assumed: each segment's state entering its
  first real sample must match its left neighbor's exit state (phasor
  angles and frequency) within a tolerance derived from the contraction
  bound.  One failed boundary invalidates the chunk and the caller falls
  back to the exact sequential kernel.

The frequency clamp needs no special handling — every per-step update is
the exact reference semantics, including the clamp, so railing chunks
parallelize just as well.  Cost: (W+L)/L x the sequential work, spread
over S lanes; with L = 4W that is 1.25x work for ~S/1.25 x less depth.

Accuracy note: where the phase detector input sits within the boundary-
state tolerance of +-pi, the wrapped error of the stitched and the purely
sequential trajectories can differ by 2*pi at isolated samples (the loop
is locally ill-conditioned there; any two float implementations diverge
the same way).  The validated state tolerance bounds the effect; receivers
consume the output through filters that are insensitive to isolated
2*pi error-sample differences.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

_TWO_PI = np.float32(2 * np.pi)


def plan_overlap(n: int, alpha: float, decay: float = 12.0,
                 max_segments: int = 4096):
    """Choose (segment length L, warm-up W) for an n-sample chunk, or None
    when the chunk is too short for the warm-up the loop bandwidth needs.

    W ~ decay/alpha gives a guess-forgetting factor of e^(-decay/2);
    L = 4W keeps the redundant warm-up work at 25%.
    """
    if alpha <= 0:
        return None
    w = int(decay / alpha)
    w = max(w, 64)
    lseg = 1
    while lseg < 4 * w:
        lseg *= 2
    while n % lseg != 0 or n // lseg > max_segments:
        lseg *= 2
        if lseg > n:
            return None
    if n // lseg < 2:
        return None
    return lseg, min(w, lseg)


def pll_overlap_discard(x, state, alpha, beta, fmin, fmax, mult,
                        lseg: int, warm: int,
                        tol_phase: float = 0.02, tol_freq: float = 0.005):
    """Run the exact PLL recurrence over x [N] as S concurrent segments.

    Returns (valid, new_state, out [N] complex64, err [N] float32); when
    ``valid`` is False the outputs are untrustworthy and the caller must
    use the sequential kernel.  ``state`` is (phi_l, phi_m, freq).
    """
    alpha = np.float32(alpha)
    beta = np.float32(beta)
    fmin = np.float32(fmin)
    fmax = np.float32(fmax)
    multf = np.float32(mult)
    n = x.shape[-1]
    s = n // lseg
    p0, m0, f0 = (jnp.asarray(v, jnp.float32) for v in state)

    # per-segment inputs [S, W+L]: W samples of the left neighbor's tail
    # (zeros-padded for segment 0, whose warm-up is masked off anyway)
    xpad = jnp.concatenate([jnp.zeros((warm,), x.dtype), x])[:s * lseg]
    seg = jnp.concatenate([xpad.reshape(s, lseg)[:, :warm],
                           x.reshape(s, lseg)], axis=1)     # [S, W+L]

    # initial states: segment 0 takes the true carry; others guess the VCO
    # on the first warm-up sample's phase and the carried frequency
    first = seg[:, 0]
    fmag = jnp.abs(first)
    fhat = jnp.where(fmag > 0, first / jnp.maximum(fmag, np.float32(1e-30)),
                     jnp.ones_like(first)).astype(jnp.complex64)
    is0 = jnp.arange(s) == 0
    vr = jnp.where(is0, jnp.cos(p0), fhat.real).astype(jnp.float32)
    vi = jnp.where(is0, jnp.sin(p0), fhat.imag).astype(jnp.float32)
    mr = jnp.where(is0, jnp.cos(m0), np.float32(1.0)).astype(jnp.float32)
    mi = jnp.where(is0, jnp.sin(m0), np.float32(0.0)).astype(jnp.float32)
    fr = jnp.broadcast_to(f0, (s,)).astype(jnp.float32)

    xs = jnp.moveaxis(seg, 1, 0)                            # [W+L, S]
    steps = jnp.arange(warm + lseg)

    def step(carry, inp):
        vr, vi, mr, mi, fr, svr, svi, smr, smi, sfr = carry
        xi, i = inp
        # snapshot the state ENTERING the first post-warm-up sample: this
        # is the boundary state the left neighbor must reproduce
        snap = i == warm
        svr = jnp.where(snap, vr, svr)
        svi = jnp.where(snap, vi, svi)
        smr = jnp.where(snap, mr, smr)
        smi = jnp.where(snap, mi, smi)
        sfr = jnp.where(snap, fr, sfr)

        xr, xim = xi.real.astype(jnp.float32), xi.imag.astype(jnp.float32)
        pr = xr * vr + xim * vi
        pi_ = xim * vr - xr * vi
        err = jnp.arctan2(pi_, pr)
        f2 = fr + beta * err
        dl = f2 + alpha * err
        dm = multf * f2 + alpha * err
        sl, cl = jnp.sin(dl), jnp.cos(dl)
        sm, cm = jnp.sin(dm), jnp.cos(dm)
        vr2 = vr * cl - vi * sl
        vi2 = vr * sl + vi * cl
        mr2 = mr * cm - mi * sm
        mi2 = mr * sm + mi * cm
        gv = np.float32(1.5) - np.float32(0.5) * (vr2 * vr2 + vi2 * vi2)
        gm = np.float32(1.5) - np.float32(0.5) * (mr2 * mr2 + mi2 * mi2)
        f3 = jnp.clip(f2, fmin, fmax)
        # segment 0 holds its true carry through the (zero-filled) warm-up
        active = jnp.logical_or(jnp.arange(s) > 0, i >= warm)
        out_r, out_i, out_e = mr, mi, err
        vr = jnp.where(active, vr2 * gv, vr)
        vi = jnp.where(active, vi2 * gv, vi)
        mr = jnp.where(active, mr2 * gm, mr)
        mi = jnp.where(active, mi2 * gm, mi)
        fr = jnp.where(active, f3, fr)
        return ((vr, vi, mr, mi, fr, svr, svi, smr, smi, sfr),
                (out_r, out_i, out_e))

    zero = jnp.zeros((s,), jnp.float32)
    carry0 = (vr, vi, mr, mi, fr, zero, zero, zero, zero, zero)
    carry, (o_r, o_i, o_e) = lax.scan(step, carry0, (xs, steps), unroll=8)
    vr, vi, mr, mi, fr, svr, svi, smr, smi, sfr = carry

    # boundary check: segment s-1's exit state vs segment s's post-warm-up
    # entry state — the VCO phasor and frequency only.  The multiplied
    # output oscillator phi_m is a pure open-loop integrator (no feedback,
    # pll.lua:158), so it is NOT observable from the input: each segment
    # computes it up to an unknown constant offset, corrected below.
    def pdist(ar, ai, br, bi):
        # |angle(a * conj(b))| via the cross/dot products
        return jnp.abs(jnp.arctan2(ai * br - ar * bi, ar * br + ai * bi))
    d_v = pdist(vr[:-1], vi[:-1], svr[1:], svi[1:])
    d_f = jnp.abs(fr[:-1] - sfr[1:])
    valid = ((jnp.max(d_v) < np.float32(tol_phase))
             & (jnp.max(d_f) < np.float32(tol_freq)))

    # phi_m offset chain: segment s's outputs rotate by
    # delta_s = prod_{j<s} exit_j * conj(entry_{j+1}) (delta_0 = 1, the
    # true carry).  Increments within a segment are exact once the VCO
    # trajectory is; only the integration constant chains across segments.
    exit_m = lax.complex(mr, mi)
    snap_m = lax.complex(smr, smi)
    ratio = jnp.concatenate(
        [jnp.ones((1,), jnp.complex64),
         (exit_m[:-1] * jnp.conj(snap_m[1:])).astype(jnp.complex64)])
    delta = jnp.cumprod(ratio)
    delta = delta / jnp.maximum(jnp.abs(delta), np.float32(1e-30)).astype(
        jnp.float32)

    # discard warm-up outputs, apply the offset chain, restitch
    out = lax.complex(o_r[warm:], o_i[warm:]) * delta[None, :]   # [L, S]
    err = o_e[warm:]
    out = jnp.moveaxis(out, 0, 1).reshape(n).astype(jnp.complex64)
    err = jnp.moveaxis(err, 0, 1).reshape(n).astype(jnp.float32)

    m_last = exit_m[-1] * delta[-1]
    new_state = (jnp.arctan2(vi[-1], vr[-1]),
                 jnp.arctan2(m_last.imag, m_last.real), fr[-1])
    return valid, new_state, out, err


__all__ = ["plan_overlap", "pll_overlap_discard"]
