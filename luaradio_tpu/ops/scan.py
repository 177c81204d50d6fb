"""Linear-recurrence kernels (IIR filters, averaging loops) as parallel
associative scans.

The reference implements IIR filters as sequential per-sample loops through
liquid-dsp or pure Lua (/root/reference/radio/blocks/signal/iirfilter.lua).
A sequential loop is the worst possible TPU program, so recurrences are
reformulated as **associative scans** over affine maps, which XLA executes as
a log-depth parallel tree on the VPU:

* first-order:  y[n] = a*y[n-1] + u[n]    — scalar affine pairs (a, u)
* order-p:      s[n] = A s[n-1] + g x[n]  — (p x p matrix, p vector) pairs,
  the transposed-direct-form-II state-space of the b/a tap form.

Cost is O(N log N) elementwise work and O(N p^2) memory; for the p <= 4
filters of real receivers this is far cheaper than any sequential loop.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _affine_combine(c1, c2):
    a1, u1 = c1
    a2, u2 = c2
    return a1 * a2, a2 * u1 + u2


def _affine_scan_doubling(a, u):
    """Inclusive affine scan along the last axis by Hillis-Steele doubling.

    Used instead of lax.associative_scan when the decay coefficients are
    DATA (not a splat constant): the odd/even-recursion lowering of
    associative_scan with two genuine tensor operands hits pathological
    compile times on the TPU compiler (measured: minutes at [16k, 256]
    where the constant-coefficient case takes 2 s); this is ~log2(B)
    shifted fused-elementwise passes with trivially linear compile cost.
    """
    n = a.shape[-1]
    d = 1
    while d < n:
        a_prev = jnp.concatenate(
            [jnp.ones_like(a[..., :d]), a[..., :-d]], axis=-1)
        u_prev = jnp.concatenate(
            [jnp.zeros_like(u[..., :d]), u[..., :-d]], axis=-1)
        u = a * u_prev + u
        a = a_prev * a
        d *= 2
    return a, u


def linrec_first_order(u: jnp.ndarray, a, y0) -> jnp.ndarray:
    """Solve y[n] = a*y[n-1] + u[n] for all n in parallel.

    u: [..., N]; a: scalar (or broadcastable array); y0: [...] initial y[-1].
    Returns y: [..., N].

    Two-level blocked scan: a plain associative_scan is ~log2(N) elementwise
    passes over HBM; blocking into [N/B, B] scans the short block axis, then
    the tiny summary axis, then applies the carries — ~3 passes total.
    Works for array-valued ``a`` too (data-dependent decay: the AGC gate,
    clock-recovery hysteresis); only small/ragged chunks take the flat scan.
    """
    a_is_array = hasattr(a, "shape") and np.ndim(a) > 0
    n = u.shape[-1]
    B = 256
    if n < 4 * B or n % B != 0:
        a_arr = jnp.broadcast_to(jnp.asarray(a, dtype=u.dtype), u.shape)
        if a_is_array and n >= 64:
            acum, ucum = _affine_scan_doubling(a_arr, u)
        else:
            acum, ucum = lax.associative_scan(_affine_combine, (a_arr, u),
                                              axis=-1)
        y0 = jnp.asarray(y0, dtype=u.dtype)
        return acum * y0[..., None] + ucum

    lead = u.shape[:-1]
    nb = n // B
    ub = u.reshape(lead + (nb, B))
    ab = jnp.broadcast_to(jnp.asarray(a, dtype=u.dtype),
                          u.shape).reshape(lead + (nb, B))
    if a_is_array:
        acum, ucum = _affine_scan_doubling(ab, ub)
    else:
        acum, ucum = lax.associative_scan(_affine_combine, (ab, ub), axis=-1)
    # block summaries -> exclusive carry per block
    sa = acum[..., -1]
    su = ucum[..., -1]
    if a_is_array:
        ca, cu = _affine_scan_doubling(sa, su)
    else:
        ca, cu = lax.associative_scan(_affine_combine, (sa, su), axis=-1)
    y0 = jnp.asarray(y0, dtype=u.dtype)
    carry_y = ca * y0[..., None] + cu               # y at each block's end
    carry_in = jnp.concatenate([y0[..., None], carry_y[..., :-1]], axis=-1)
    y = acum * carry_in[..., None] + ucum
    return y.reshape(lead + (n,))


def iir_state_space(b_taps: np.ndarray, a_taps: np.ndarray):
    """Build the transposed-direct-form-II state-space (A, g, b0) for
    y = b/a filtering with a[0]-normalized coefficients.

    s[n] = A s[n-1] + g x[n];  y[n] = b0 x[n] + s[n-1][0].
    """
    b = np.asarray(b_taps, dtype=np.float64)
    a = np.asarray(a_taps, dtype=np.float64)
    b = b / a[0]
    a = a / a[0]
    p = max(len(b), len(a)) - 1
    bb = np.zeros(p + 1)
    bb[:len(b)] = b
    aa = np.zeros(p + 1)
    aa[:len(a)] = a
    A = np.zeros((p, p))
    for i in range(p - 1):
        A[i, i + 1] = 1.0
    A[:, 0] = -aa[1:]
    g = bb[1:] - aa[1:] * bb[0]
    return A.astype(np.float32), g.astype(np.float32), np.float32(bb[0])


def _iir_cums(x: jnp.ndarray, A: jnp.ndarray, g: jnp.ndarray):
    """Cumulative affine maps of the order-p state space: (mcum [..,N,p,p],
    vcum [..,N,p]) with s[n] = mcum[n] @ s0 + vcum[n]."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    p = A.shape[0]
    dtype = x.dtype
    A = A.astype(jnp.float32)
    if jnp.iscomplexobj(x):
        A = A.astype(dtype)
    g = g.astype(dtype)

    # v[n] = g * x[n]  (affine offsets), constant matrices broadcast per step
    v = x[..., None] * g  # [..., N, p]
    mats = jnp.broadcast_to(A, lead + (n, p, p))

    def combine(c1, c2):
        m1, v1 = c1
        m2, v2 = c2
        return (jnp.einsum("...ij,...jk->...ik", m2, m1,
                           precision=lax.Precision.HIGHEST),
                jnp.einsum("...ij,...j->...i", m2, v1,
                           precision=lax.Precision.HIGHEST) + v2)

    return lax.associative_scan(combine, (mats, v), axis=-3)


def _iir_emit(x, mcum, vcum, b0, s_in):
    """Outputs and final state given the entering state s_in."""
    dtype = x.dtype
    s = jnp.einsum("...nij,...j->...ni", mcum, s_in.astype(dtype),
                   precision=lax.Precision.HIGHEST) + vcum
    s_prev = jnp.concatenate(
        [s_in.astype(dtype)[..., None, :], s[..., :-1, :]], axis=-2)
    y = jnp.asarray(b0, dtype=dtype) * x + s_prev[..., 0]
    return y, s[..., -1, :]


def iir_apply(x: jnp.ndarray, A: jnp.ndarray, g: jnp.ndarray, b0,
              s0: jnp.ndarray):
    """Apply an order-p IIR via associative scan over affine maps.

    x: [..., N]; A: [p, p]; g: [p]; s0: [..., p] carried state.
    Returns (y [..., N], s_new [..., p]).
    """
    mcum, vcum = _iir_cums(x, A, g)
    return _iir_emit(x, mcum, vcum, b0, s0)


def iir_apply_sharded(x: jnp.ndarray, A_np: np.ndarray, g: jnp.ndarray, b0,
                      s0: jnp.ndarray, axis_name: str):
    """Order-p IIR over a time-sharded stream inside shard_map.

    Each shard scans locally; the cross-shard state chain
    s_in(d) = A^L s_in(d-1) + v_d uses the STATIC matrix power A^L
    (float64 at trace time) and one all_gather of the p-vector local
    summaries — O(D p) collective payload.  ``A_np`` must be the host
    (numpy) state matrix.  Returns (y local, s_new global)."""
    lseg = x.shape[-1]
    dtype = x.dtype
    A = jnp.asarray(A_np)
    mcum, vcum = _iir_cums(x, A, g)
    v_last = vcum[..., -1, :]
    all_v = lax.all_gather(v_last, axis_name)       # [D, ..., p]
    d = lax.axis_size(axis_name)
    al = np.linalg.matrix_power(np.asarray(A_np, np.float64), lseg)
    al = jnp.asarray(al.astype(np.complex64 if jnp.iscomplexobj(x)
                               else np.float32))
    s_in = s0.astype(dtype)
    s_ins = []
    for dd in range(d):                              # static D, tiny
        s_ins.append(s_in)
        s_in = jnp.einsum("ij,...j->...i", al, s_in,
                          precision=lax.Precision.HIGHEST) + all_v[dd]
    idx = lax.axis_index(axis_name)
    mine = jnp.stack(s_ins, axis=0)[idx]
    y, _ = _iir_emit(x, mcum, vcum, b0, mine)
    return y, s_in                                   # s_in(D): global final


def cummax_blocked(x: jnp.ndarray) -> jnp.ndarray:
    """Cumulative max along the last axis via the same two-level blocking
    as :func:`linrec_first_order` (~3 HBM passes instead of log2(N); XLA's
    lax.cummax lowers to a log-depth pass sequence)."""
    n = x.shape[-1]
    B = 256
    if n < 4 * B or n % B != 0:
        return lax.cummax(x, axis=x.ndim - 1)
    lead = x.shape[:-1]
    nb = n // B
    xb = x.reshape(lead + (nb, B))
    local = lax.cummax(xb, axis=xb.ndim - 1)
    heads = local[..., -1]                       # per-block maxes
    carry = lax.cummax(heads, axis=heads.ndim - 1)
    prev = jnp.concatenate(
        [jnp.full_like(carry[..., :1], -np.inf), carry[..., :-1]], axis=-1)
    y = jnp.maximum(local, prev[..., None])
    return y.reshape(lead + (n,))


def cumsum_phase(x: jnp.ndarray, phase0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Running phase accumulation with wrap-around: phi[n] = phi[n-1] + x[n],
    kept in (-pi, pi] to preserve float32 precision over unbounded streams.
    Returns (phi [..., N], carry phi[N-1])."""
    two_pi = jnp.asarray(2 * np.pi, dtype=x.dtype)
    phi = jnp.cumsum(x, axis=-1) + jnp.asarray(phase0, dtype=x.dtype)[..., None]
    carry = phi[..., -1]
    carry = carry - two_pi * jnp.round(carry / two_pi)
    return phi, carry


__all__ = ["linrec_first_order", "iir_state_space", "iir_apply",
           "iir_apply_sharded", "cummax_blocked", "cumsum_phase"]
