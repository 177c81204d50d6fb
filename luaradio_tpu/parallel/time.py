"""Time-axis sharding: split one stream's time axis across mesh devices,
exchanging the carried-state halos between neighbors over ICI.

The reference carries per-block streaming state sequentially (SURVEY §5:
FIR keeps M-1 samples, discriminator 1 sample, IIR scalar recurrences).
Sharding time across D devices turns those into:

* **halo exchange** (`ppermute` from the left neighbor) for blocks whose
  state is just the last K input samples — FIR, discriminator, delay;
* **distributed prefix combine** for first-order linear recurrences — each
  shard scans locally, the tiny per-shard summaries are all-gathered, the
  cross-shard carry is an exclusive scan over D elements, and the local
  results are corrected.  Two log-depth passes instead of a sequential
  stream.

All helpers here are meant to run inside `shard_map` over a mesh axis, with
the time axis of the operand sharded on that axis.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def shard0_state(state, axis_name: str):
    """Centralize the carried-state invariant for sharded blocks.

    Blocks that return a ring_halo-derived state emit PER-SHARD-DIVERGENT
    values under a nominally replicated out_spec: only shard 0's copy (the
    global stream tail) is the true next-chunk carry, and the runtime reads
    carried state off shard 0 only (Segment.fn's shard_map runs with the
    replication checker off, and jax materializes the P() output from the
    first shard).  Every such block routes its returned state through this
    helper so the invariant lives in ONE place.

    With ``LUARADIO_TPU_REPLICATE_SHARDED_STATE=1`` the state is instead
    genuinely replicated — every shard takes shard 0's copy via one
    all_gather — so any consumer (a future JAX that re-canonicalizes
    replicated outputs, checkpointing, a host fetch from a non-zero shard)
    reads the true carry.  tests/parallel/test_time_runner.py asserts the
    two modes produce bit-identical streams.
    """
    import os
    if not os.environ.get("LUARADIO_TPU_REPLICATE_SHARDED_STATE"):
        return state
    return jax.tree.map(lambda l: lax.all_gather(l, axis_name)[0], state)


def left_halo(x: jnp.ndarray, k: int, axis_name: str) -> jnp.ndarray:
    """The last k samples of the LEFT neighbor's shard (zeros on device 0) —
    exactly the FIR tail the reference carries across process() calls
    (firfilter.lua:115-119)."""
    d = lax.axis_size(axis_name)
    tail = x[..., -k:]
    perm = [(i, i + 1) for i in range(d - 1)]
    halo = lax.ppermute(tail, axis_name, perm)  # devices with no source get 0
    return halo


def ring_halo(x: jnp.ndarray, k: int, axis_name: str) -> jnp.ndarray:
    """Circular left-neighbor tail: shard d receives shard (d-1) mod D's
    last k samples.  ONE collective serves two purposes at once: shards
    1..D-1 get their intra-chunk halo, while the value landing on shard 0
    is the stream's global input tail — exactly the next chunk's carried
    state.  Blocks whose state is a pure input tail therefore need no
    end-of-chunk all_gather at all: they return what they received, and
    only shard 0's copy (the true carry) is read next chunk."""
    d = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % d) for i in range(d)]
    return lax.ppermute(x[..., -k:], axis_name, perm)


def fir_sharded(x: jnp.ndarray, taps: jnp.ndarray, axis_name: str,
                tail=None) -> jnp.ndarray:
    """Causal FIR over a time-sharded stream.  ``tail`` (the global carried
    state, [..., M-1]) is applied on shard 0 only; interior shards get their
    halo from the left neighbor."""
    from luaradio_tpu.ops.fir import fir_direct
    m = taps.shape[0]
    if m == 1:
        y, _ = fir_direct(x, taps, jnp.zeros(x.shape[:-1] + (0,), x.dtype))
        return y
    halo = left_halo(x, m - 1, axis_name)
    if tail is not None:
        idx = lax.axis_index(axis_name)
        halo = jnp.where(idx == 0, tail.astype(halo.dtype), halo)
    y, _ = fir_direct(x, taps, halo)
    return y


def fir_fft_sharded(x: jnp.ndarray, h_freq: jnp.ndarray, l: int,
                    axis_name: str, real_in_real_taps: bool,
                    tail=None) -> jnp.ndarray:
    """Overlap-save FFT FIR over a time-sharded stream: each shard's L-sample
    overlap comes from the left neighbor via ppermute (the reference carries
    the same overlap between its FFT blocks, firfilter.lua:392).  The shard
    length must be a multiple of the frame hop L."""
    from luaradio_tpu.ops.fir import fir_fft
    halo = left_halo(x, l, axis_name)
    if tail is not None:
        idx = lax.axis_index(axis_name)
        halo = jnp.where(idx == 0, tail.astype(halo.dtype), halo)
    y, _ = fir_fft(x, h_freq, halo, real_in_real_taps)
    return y


def discriminator_sharded(x: jnp.ndarray, gain: float,
                          axis_name: str) -> jnp.ndarray:
    """Frequency discriminator with a 1-sample halo
    (frequencydiscriminator.lua:61 carries one sample)."""
    prev_last = left_halo(x, 1, axis_name)
    prev = jnp.concatenate([prev_last, x[..., :-1]], axis=-1)
    t = x * jnp.conj(prev)
    return jnp.arctan2(t.imag, t.real) * np.float32(1.0 / (2 * np.pi * gain))


def linrec_first_order_sharded(u: jnp.ndarray, a, y0, axis_name: str,
                               with_final: bool = False):
    """Distributed y[n] = a*y[n-1] + u[n] over a time-sharded stream.

    Local associative scan + cross-shard exclusive prefix over the per-shard
    (decay, offset) summaries.  Collective payload: 2 scalars per shard per
    leading element.

    ``with_final=True`` additionally returns the stream's GLOBAL final value
    (y at the last sample of the last shard), replicated on every shard —
    computed from the already-gathered summaries at zero extra collective
    cost, so recurrence blocks need no end-of-chunk state all_gather.
    """
    from luaradio_tpu.ops.scan import _affine_scan_doubling
    n = u.shape[-1]
    a_is_array = hasattr(a, "shape") and np.ndim(a) > 0
    a_arr = jnp.broadcast_to(jnp.asarray(a, dtype=u.dtype), u.shape)

    # local scan with zero initial state (doubling form for data
    # coefficients: the two-operand associative_scan lowering is a
    # compile-time hazard on the TPU compiler — see ops/scan.py)
    def combine(c1, c2):
        a1, u1 = c1
        a2, u2 = c2
        return a1 * a2, a2 * u1 + u2

    if a_is_array:
        acum, ucum = _affine_scan_doubling(a_arr, u)
    else:
        acum, ucum = lax.associative_scan(combine, (a_arr, u), axis=-1)

    # per-shard summary: (prod a, final local y) -> all-gather over shards
    summ_a = acum[..., -1]
    summ_u = ucum[..., -1]
    all_a = lax.all_gather(summ_a, axis_name)  # [D, ...]
    all_u = lax.all_gather(summ_u, axis_name)
    # exclusive cross-shard carry: c_d = y entering shard d
    ca, cu = lax.associative_scan(combine, (all_a, all_u), axis=0)
    idx = lax.axis_index(axis_name)
    y0 = jnp.asarray(y0, dtype=u.dtype)
    carry_in = jnp.where(idx == 0, y0,
                         ca[idx - 1] * y0 + cu[idx - 1])
    y = acum * carry_in[..., None] + ucum
    if with_final:
        return y, ca[-1] * y0 + cu[-1]
    return y


def delay_sharded(x: jnp.ndarray, k: int, axis_name: str,
                  carry=None) -> jnp.ndarray:
    """y[n] = x[n-k] over a time-sharded stream: the first k samples of each
    shard come from the left neighbor (``carry`` = the global delay line,
    applied on shard 0 — reference delay.lua keeps the same line)."""
    halo = left_halo(x, k, axis_name)
    if carry is not None:
        idx = lax.axis_index(axis_name)
        halo = jnp.where(idx == 0, carry.astype(halo.dtype), halo)
    return jnp.concatenate([halo, x[..., :-k]], axis=-1)


def pilot_recovery_sharded(x: jnp.ndarray, taps: jnp.ndarray, mult: int,
                           axis_name: str, tail=None) -> jnp.ndarray:
    """Time-sharded vectorized pilot recovery: complex bandpass FIR (halo
    exchange) + magnitude normalization + integer phase multiplication —
    the shardable alternative to the reference's sequential pilot PLL
    (pll.lua:138-167).  See blocks/signal/carrier.py PilotRecoveryBlock."""
    from luaradio_tpu.blocks.signal.carrier import pilot_normalize_multiply
    p = fir_sharded(x, taps, axis_name, tail=tail)
    return pilot_normalize_multiply(p, mult)


def cummax_sharded(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Distributed cumulative max along a time-sharded axis (most-recent-
    event indices, e.g. zero-crossing clock recovery)."""
    from luaradio_tpu.ops.scan import cummax_blocked
    local = cummax_blocked(x)
    heads = lax.all_gather(local[..., -1], axis_name)        # [D, ...]
    idx = lax.axis_index(axis_name)
    d = heads.shape[0]
    mask = (jnp.arange(d)[(...,) + (None,) * (heads.ndim - 1)] < idx)
    prev = jnp.max(jnp.where(mask, heads,
                             jnp.full_like(heads, -np.inf)), axis=0)
    return jnp.maximum(local, prev[..., None])


def cumsum_sharded(x: jnp.ndarray, axis_name: str,
                   with_total: bool = False):
    """Distributed cumulative sum along a time-sharded axis (phase
    accumulators in FM modulators).  ``with_total=True`` additionally
    returns the GLOBAL sum (replicated; zero extra collective cost — it is
    the full reduction of the already-gathered per-shard totals)."""
    local = jnp.cumsum(x, axis=-1)
    totals = lax.all_gather(local[..., -1], axis_name)  # [D, ...]
    idx = lax.axis_index(axis_name)
    prefix = jnp.where(
        jnp.arange(totals.shape[0])[(...,) + (None,) * (totals.ndim - 1)]
        < idx, totals, jnp.zeros_like(totals)).sum(axis=0)
    y = local + prefix[..., None]
    if with_total:
        return y, totals.sum(axis=0)
    return y


__all__ = ["left_halo", "shard0_state", "fir_sharded", "fir_fft_sharded",
           "pll_linear_sharded",
           "discriminator_sharded", "linrec_first_order_sharded",
           "cummax_sharded", "cumsum_sharded", "delay_sharded",
           "pilot_recovery_sharded"]


def pll_linear_sharded(x: jnp.ndarray, state, alpha, beta, fmin, fmax,
                       mult: int, axis_name: str):
    """Time-sharded parallel-in-time PLL (locked-loop linear solution).

    The distributed form of ops/pll_linear.py: while the loop is locked its
    recurrence is exactly linear, so the whole PLL becomes compositions of
    primitives that already shard — wrapped-phase diffs (1-sample halo),
    global detrended cumsum (cumsum_sharded), two first-order complex
    recurrences (linrec_first_order_sharded), and error cumsums.  Guards
    (|err| < pi, clamp inactive, bounded residual) are global pmax
    reductions; the returned ``valid`` is replicated.  Unlike the
    single-device hybrid there is NO in-graph sequential fallback — a
    per-sample feedback loop cannot time-shard — so callers must treat
    valid=False as "re-run this chunk serially" (acquisition transients).

    x: [..., T_local] complex inside shard_map; state (phi_l, phi_m, freq)
    replicated scalars/[...]-vectors; mult a positive integer.
    Returns (valid, new_state, out, err).
    """
    alpha = np.float32(alpha)
    beta = np.float32(beta)
    two_pi = np.float32(2 * np.pi)

    def wrap(a):
        return a - two_pi * jnp.round(a / two_pi)

    p0, m0, f0 = (jnp.asarray(s, jnp.float32) for s in state)
    d = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    n_local = x.shape[-1]
    n_global = d * n_local

    theta = jnp.arctan2(x.imag, x.real).astype(jnp.float32)
    mag = jnp.abs(x)
    xhat = jnp.where(mag > 0, x / jnp.maximum(mag, np.float32(1e-30)),
                     jnp.ones_like(x)).astype(jnp.complex64)

    # wrapped phase increments with a 1-sample halo; the global first slot
    # holds d0 = wrap(theta[0] - p0) instead
    prev = jnp.concatenate([left_halo(theta, 1, axis_name),
                            theta[..., :-1]], axis=-1)
    inc = wrap(theta - prev)
    first = (idx == 0)
    d0 = wrap(theta[..., :1] - p0[..., None])
    inc = jnp.where(first, jnp.concatenate([d0, inc[..., 1:]], axis=-1), inc)

    # global trend c1 = mean of the n_global-1 true increments
    local_sum = jnp.sum(inc, axis=-1) - jnp.where(first, d0[..., 0],
                                                  jnp.zeros_like(d0[..., 0]))
    c1 = lax.psum(local_sum, axis_name) / np.float32(max(n_global - 1, 1))

    # detrended unwrapped phase tau[n] = d0 + sum_{1..n}(inc - c1)
    v = inc - c1[..., None]
    v = jnp.where(first, jnp.concatenate([d0, v[..., 1:]], axis=-1), v)
    tau = cumsum_sharded(v, axis_name)

    # two decoupled complex first-order recurrences (trace-time eigenstuff)
    a_mat = np.array([[1.0 - alpha - beta, 1.0], [-beta, 1.0]], np.float64)
    lam, vmat = np.linalg.eig(a_mat.astype(np.complex128))
    vinv = np.linalg.inv(vmat)
    w_in = vinv @ np.array([alpha + beta, beta], np.complex128)
    f_dev = (f0 - c1).astype(jnp.complex64)

    phs = []
    for row in range(2):  # p_h and f_h rows of s_h
        acc = None
        for k in range(2):
            u = jnp.asarray(np.complex64(w_in[k])) * tau.astype(jnp.complex64)
            z_init = jnp.asarray(np.complex64(vinv[k, 1])) * f_dev
            zk = linrec_first_order_sharded(u, np.complex64(lam[k]), z_init,
                                            axis_name)
            # shift right by one: s_h[n] enters err[n]
            zk = delay_sharded(zk, 1, axis_name,
                               carry=z_init[..., None])
            term = np.complex64(vmat[row, k]) * zk
            acc = term if acc is None else acc + term
        phs.append(acc.real.astype(jnp.float32))
    p_h, f_h = phs

    err = tau - p_h
    f_new = c1[..., None] + f_h + beta * err

    margin = np.float32(np.pi * (15.0 / 16.0))
    ok = ((jnp.max(jnp.abs(err), axis=-1) < margin)
          & (jnp.max(f_new, axis=-1) <= np.float32(fmax))
          & (jnp.min(f_new, axis=-1) >= np.float32(fmin))
          & (jnp.max(jnp.abs(tau), axis=-1) < np.float32(512.0)))
    valid = lax.pmin(ok.astype(jnp.float32), axis_name) > 0

    # outputs: unit phasors x small rotations
    s_cum = cumsum_sharded(err, axis_name) - err   # exclusive cumsum
    small = -np.float32(mult) * err + alpha * np.float32(1 - mult) * s_cum
    base = lax.complex(jnp.cos(m0 - np.float32(mult) * p0),
                       jnp.sin(m0 - np.float32(mult) * p0))[..., None]
    y = xhat
    for _ in range(mult - 1):
        y = y * xhat
    rot = lax.complex(jnp.cos(small), jnp.sin(small))
    out = (base * y * rot).astype(jnp.complex64)

    # final state from the global last sample
    def from_last(vv):
        return lax.all_gather(vv, axis_name)[-1]

    xl = from_last(xhat[..., -1])
    el = from_last(err[..., -1])
    fl = from_last(f_new[..., -1])
    ol = from_last(out[..., -1])
    dl = fl + (alpha - np.float32(1.0)) * el
    vco_next = xl * lax.complex(jnp.cos(dl), jnp.sin(dl))
    dm = np.float32(mult) * fl + alpha * el
    osc_next = ol * lax.complex(jnp.cos(dm), jnp.sin(dm))
    new_state = (jnp.arctan2(vco_next.imag, vco_next.real),
                 jnp.arctan2(osc_next.imag, osc_next.real),
                 jnp.clip(fl, np.float32(fmin), np.float32(fmax)))
    return valid, new_state, out, err
