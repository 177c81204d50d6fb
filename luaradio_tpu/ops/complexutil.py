"""Complex-array boundary helpers.

TPU backends have no native complex type: XLA lowers complex arithmetic to
real pairs *inside* a program, but complex64 arrays at a program boundary
(host<->device transfers, eager op dispatch, large complex constants) are not
supported by the TPU PJRT plugin.  The runtime therefore keeps every
host<->device edge real-typed:

* complex chunks cross the boundary as **interleaved float32** of length 2N —
  a zero-copy ``.view()`` on the host (and exactly the I/Q wire layout the
  file/SDR formats already use), packed/unpacked by fused reshapes on-device;
* complex constants (mixer phasor tables, filter taps, constellations) enter
  traced code through :func:`const_complex`, which stages the real and
  imaginary parts separately and joins them with ``lax.complex`` in-graph.

Device-resident complex arrays (carried block state between jit calls) are
fine — they never cross the boundary.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax


def const_complex(arr: np.ndarray) -> jnp.ndarray:
    """Stage a host complex array as a traced constant via float parts."""
    arr = np.asarray(arr)
    if not np.iscomplexobj(arr):
        return jnp.asarray(arr)
    return lax.complex(jnp.asarray(arr.real.astype(np.float32)),
                       jnp.asarray(arr.imag.astype(np.float32)))


def host_to_payload(arr: np.ndarray) -> np.ndarray:
    """Host-side: complex64 [..., N] -> interleaved float32 [..., 2N]
    (zero-copy view).  0-d scalars (resident window starts) pass through
    unchanged — np.ascontiguousarray would silently promote them to
    shape (1,)."""
    if np.ndim(arr) == 0:
        return arr
    arr = np.ascontiguousarray(arr)
    if np.iscomplexobj(arr):
        return arr.view(np.float32)
    return arr


def payload_to_host(arr: np.ndarray, complex_: bool) -> np.ndarray:
    """Host-side: interleaved float32 [..., 2N] -> complex64 [..., N]
    (zero-copy view)."""
    arr = np.ascontiguousarray(arr)
    if complex_:
        return arr.view(np.complex64)
    return arr


def deinterleave(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Traced: interleaved float32 [..., 2N] -> (re [..., N], im [..., N]).

    On TPU a stride-2 lane slice forces a catastrophic relayout (measured
    ~6x slower than a raw read); ops.layout expresses the split as a
    selection matmul on the MXU, which runs at full HBM bandwidth.
    """
    from luaradio_tpu.ops.layout import phase_split
    re, im = phase_split(x, 2)
    return re, im


def interleave(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """Traced: (re [..., N], im [..., N]) -> interleaved float32 [..., 2N]
    (transpose of :func:`deinterleave`, same MXU formulation on TPU)."""
    from luaradio_tpu.ops.layout import phase_merge
    return phase_merge([re, im])


def unpack_complex(x: jnp.ndarray) -> jnp.ndarray:
    """Traced: interleaved float32 [..., 2N] -> complex64 [..., N]."""
    re, im = deinterleave(x)
    return lax.complex(re, im)


def pack_complex(z: jnp.ndarray) -> jnp.ndarray:
    """Traced: complex64 [..., N] -> interleaved float32 [..., 2N]."""
    return interleave(jnp.real(z), jnp.imag(z))


__all__ = ["const_complex", "host_to_payload", "payload_to_host",
           "unpack_complex", "pack_complex", "deinterleave", "interleave"]
