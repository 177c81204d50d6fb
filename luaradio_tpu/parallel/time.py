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


def left_halo(x: jnp.ndarray, k: int, axis_name: str) -> jnp.ndarray:
    """The last k samples of the LEFT neighbor's shard (zeros on device 0) —
    exactly the FIR tail the reference carries across process() calls
    (firfilter.lua:115-119)."""
    d = lax.axis_size(axis_name)
    tail = x[..., -k:]
    perm = [(i, i + 1) for i in range(d - 1)]
    halo = lax.ppermute(tail, axis_name, perm)  # devices with no source get 0
    return halo


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


def linrec_first_order_sharded(u: jnp.ndarray, a, y0, axis_name: str):
    """Distributed y[n] = a*y[n-1] + u[n] over a time-sharded stream.

    Local associative scan + cross-shard exclusive prefix over the per-shard
    (decay, offset) summaries.  Collective payload: 2 scalars per shard per
    leading element.
    """
    from luaradio_tpu.ops.scan import linrec_first_order
    n = u.shape[-1]
    a_arr = jnp.broadcast_to(jnp.asarray(a, dtype=u.dtype), u.shape)

    # local scan with zero initial state
    def combine(c1, c2):
        a1, u1 = c1
        a2, u2 = c2
        return a1 * a2, a2 * u1 + u2

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
    return acum * carry_in[..., None] + ucum


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


def cumsum_sharded(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Distributed cumulative sum along a time-sharded axis (phase
    accumulators in FM modulators)."""
    local = jnp.cumsum(x, axis=-1)
    totals = lax.all_gather(local[..., -1], axis_name)  # [D, ...]
    idx = lax.axis_index(axis_name)
    prefix = jnp.where(
        jnp.arange(totals.shape[0])[(...,) + (None,) * (totals.ndim - 1)]
        < idx, totals, jnp.zeros_like(totals)).sum(axis=0)
    return local + prefix[..., None]


__all__ = ["left_halo", "fir_sharded", "fir_fft_sharded",
           "discriminator_sharded", "linrec_first_order_sharded",
           "cumsum_sharded", "delay_sharded", "pilot_recovery_sharded"]
