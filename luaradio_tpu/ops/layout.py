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
    """[..., N] -> k phase arrays [..., N//k] with phase p = x[..., p::k]."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    if k == 1:
        return [x]
    if _fast_ok(x, k):
        nb = n // (_LANES * k)
        fr = x.reshape(lead + (nb, _LANES * k))
        y = jnp.einsum("...nc,cd->...nd", fr,
                       jnp.asarray(_phase_matrix(k), dtype=np.float32),
                       precision=lax.Precision.HIGHEST)
        return [y[..., p * _LANES:(p + 1) * _LANES].reshape(lead + (n // k,))
                for p in range(k)]
    return [x[..., p::k] for p in range(k)]


def phase_merge(xs: list[jnp.ndarray]) -> jnp.ndarray:
    """Inverse of :func:`phase_split`: k phase arrays [..., M] ->
    interleaved [..., M*k]."""
    k = len(xs)
    x0 = xs[0]
    lead = x0.shape[:-1]
    m = x0.shape[-1]
    if k == 1:
        return x0
    if (_use_mxu() and k <= _MAX_K
            and m % _LANES == 0 and m >= 4 * _LANES
            and all(x.dtype.kind in "fc" for x in xs)):
        nb = m // _LANES
        cat = jnp.concatenate(
            [x.reshape(lead + (nb, _LANES)) for x in xs], axis=-1)
        y = jnp.einsum("...nc,dc->...nd", cat,
                       jnp.asarray(_phase_matrix(k), dtype=np.float32),
                       precision=lax.Precision.HIGHEST)
        return y.reshape(lead + (m * k,))
    p = jnp.stack(xs, axis=-1)
    return p.reshape(lead + (m * k,))


def upsample_zero_stuff(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """[..., N] -> [..., N*k] with y[n*k] = x[n], zeros elsewhere."""
    if k == 1:
        return x
    zeros = jnp.zeros_like(x)
    return phase_merge([x] + [zeros] * (k - 1))


__all__ = ["phase_split", "phase_merge", "upsample_zero_stuff"]
