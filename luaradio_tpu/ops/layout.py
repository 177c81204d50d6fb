"""Lane-layout kernels: polyphase split/merge on the MXU.

TPU vector memory is (sublane, 128-lane) tiled; a stride-k slice along the
minor (time) axis — ``x[..., ::k]`` — forces a lane-granularity relayout
that measures ~6x slower than a raw HBM read.  Every interleave-flavored op
in the framework (complex<->interleaved-float boundaries, Downsampler,
Upsampler, Interleave/Deinterleave) is therefore expressed as a selection
matmul on the MXU: a [.., nb, 128*k] block of interleaved samples times a
constant [128k, 128k] 0/1 matrix yields k contiguous 128-lane phases.  The
matmul runs at full HBM bandwidth (the MXU is otherwise idle in these ops).

The reference has no analog — interleaving is free on CPU
(/root/reference/radio/blocks/signal/downsampler.lua does a scalar loop).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_LANES = 128
_MAX_K = 16  # selection matrices are [128k, 128k]; cap VMEM use


def _use_mxu() -> bool:
    # LUARADIO_TPU_FORCE_MXU_LAYOUT=1 exercises the matmul path in CPU CI
    # (the analog of the reference's acceleration-matrix test runs).
    if os.environ.get("LUARADIO_TPU_FORCE_MXU_LAYOUT"):
        return True
    return jax.default_backend() != "cpu"


def _sel_einsum(subs: str, x: jnp.ndarray, s) -> jnp.ndarray:
    """``einsum(subs, x, s)`` for a 0/1 SELECTION matrix s, bit-exact f32
    in 3 bf16 MXU passes instead of Precision.HIGHEST's 6.

    x = hi + mid + lo with each term bf16-representable covers all 24
    f32 mantissa bits; each pass selects (never mixes) elements, so the
    three partial results re-assemble the split exactly.  Complex inputs
    keep the HIGHEST path (no bf16 complex matmul)."""
    if x.dtype != jnp.float32 or os.environ.get("LUARADIO_TPU_SEL_HIGHEST"):
        # complex / f64: no bf16 decomposition (and an A/B escape hatch)
        return jnp.einsum(subs, x, jnp.asarray(s, dtype=x.real.dtype),
                          precision=lax.Precision.HIGHEST)
    xb = x.astype(jnp.bfloat16)
    r = x - xb.astype(jnp.float32)
    mb = r.astype(jnp.bfloat16)
    lb = (r - mb.astype(jnp.float32)).astype(jnp.bfloat16)
    sb = jnp.asarray(s).astype(jnp.bfloat16)

    def one(a):
        return jnp.einsum(subs, a, sb,
                          preferred_element_type=jnp.float32)

    return one(xb) + one(mb) + one(lb)


def _phase_matrix(k: int) -> np.ndarray:
    """[128k, 128k] selection matrix: an interleaved block of 128k samples
    times this yields k concatenated 128-sample phases."""
    n = _LANES * k
    s = np.zeros((n, n), np.float32)
    for j in range(_LANES):
        for p in range(k):
            s[k * j + p, p * _LANES + j] = 1.0
    return s


def _fast_ok(x: jnp.ndarray, k: int) -> bool:
    return (_use_mxu() and k <= _MAX_K
            and x.shape[-1] % (_LANES * k) == 0
            and x.shape[-1] >= 4 * _LANES * k
            and x.dtype.kind in "fc")


def phase_split(x: jnp.ndarray, k: int) -> list[jnp.ndarray]:
    """[..., N] -> k phase arrays [..., N//k] with phase p = x[..., p::k].

    N need not align to the 128k matmul block: the bulk goes through the
    MXU and the (tiny) ragged tail through the strided fallback."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    if k == 1:
        return [x]
    blk = _LANES * k
    nb = n // blk
    if (_use_mxu() and k <= _MAX_K and nb >= 2 and x.dtype.kind in "fc"
            and n % k == 0):
        main = x[..., :nb * blk]
        fr = main.reshape(lead + (nb, blk))
        y = _sel_einsum("...nc,cd->...nd", fr,
                        _phase_matrix(k))
        parts = [y[..., p * _LANES:(p + 1) * _LANES]
                 .reshape(lead + (nb * _LANES,)) for p in range(k)]
        if nb * blk != n:
            tail = x[..., nb * blk:]
            parts = [jnp.concatenate([parts[p], tail[..., p::k]], axis=-1)
                     for p in range(k)]
        return parts
    return [x[..., p::k] for p in range(k)]


def decimate_pick(x: jnp.ndarray, k: int, phase: int = 0) -> jnp.ndarray:
    """x[..., phase::k] alone — one [.., nb, 128k] x [128k, 128] matmul
    (cheaper than materializing all k phases when only one is kept, e.g.
    DownsamplerBlock)."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    if k == 1:
        return x
    blk = _LANES * k
    nb = n // blk
    if (_use_mxu() and k <= _MAX_K and nb >= 2 and x.dtype.kind in "fc"
            and n % k == 0):
        s = np.zeros((blk, _LANES), np.float32)
        for j in range(_LANES):
            s[k * j + phase, j] = 1.0
        main = x[..., :nb * blk].reshape(lead + (nb, blk))
        y = _sel_einsum("...nc,cd->...nd", main, s)
        y = y.reshape(lead + (nb * _LANES,))
        if nb * blk != n:
            y = jnp.concatenate([y, x[..., nb * blk + phase::k]], axis=-1)
        return y
    return x[..., phase::k]


def phase_merge(xs: list[jnp.ndarray]) -> jnp.ndarray:
    """Inverse of :func:`phase_split`: k phase arrays [..., M] ->
    interleaved [..., M*k]."""
    k = len(xs)
    x0 = xs[0]
    lead = x0.shape[:-1]
    m = x0.shape[-1]
    if k == 1:
        return x0
    mb = m // _LANES
    if (_use_mxu() and k <= _MAX_K and mb >= 2
            and all(x.dtype.kind in "fc" for x in xs)):
        mm = mb * _LANES
        cat = jnp.concatenate(
            [x[..., :mm].reshape(lead + (mb, _LANES)) for x in xs], axis=-1)
        y = _sel_einsum("...nc,dc->...nd", cat, _phase_matrix(k))
        y = y.reshape(lead + (mm * k,))
        if mm != m:
            tail = jnp.stack([x[..., mm:] for x in xs], axis=-1)
            y = jnp.concatenate(
                [y, tail.reshape(lead + ((m - mm) * k,))], axis=-1)
        return y
    p = jnp.stack(xs, axis=-1)
    return p.reshape(lead + (m * k,))


def upsample_zero_stuff(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """[..., N] -> [..., N*k] with y[n*k] = x[n], zeros elsewhere — one
    [.., nb, 128] x [128, 128k] matmul (no zero-plane materialization)."""
    if k == 1:
        return x
    lead = x.shape[:-1]
    n = x.shape[-1]
    nb = n // _LANES
    if (_use_mxu() and k <= _MAX_K and nb >= 2 and x.dtype.kind in "fc"):
        u = np.zeros((_LANES, _LANES * k), np.float32)
        for j in range(_LANES):
            u[j, k * j] = 1.0
        nn = nb * _LANES
        main = x[..., :nn].reshape(lead + (nb, _LANES))
        y = _sel_einsum("...nc,cd->...nd", main, u)
        y = y.reshape(lead + (nn * k,))
        if nn != n:
            tail = jnp.stack(
                [x[..., nn:]] + [jnp.zeros_like(x[..., nn:])] * (k - 1),
                axis=-1)
            y = jnp.concatenate(
                [y, tail.reshape(lead + ((n - nn) * k,))], axis=-1)
        return y
    zeros = jnp.zeros_like(x)
    p = jnp.stack([x] + [zeros] * (k - 1), axis=-1)
    return p.reshape(lead + (n * k,))


__all__ = ["phase_split", "phase_merge", "upsample_zero_stuff",
           "decimate_pick"]
