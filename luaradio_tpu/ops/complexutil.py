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
    (zero-copy view)."""
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


def unpack_complex(x: jnp.ndarray) -> jnp.ndarray:
    """Traced: interleaved float32 [..., 2N] -> complex64 [..., N]."""
    lead = x.shape[:-1]
    p = x.reshape(lead + (x.shape[-1] // 2, 2))
    return lax.complex(p[..., 0], p[..., 1])


def pack_complex(z: jnp.ndarray) -> jnp.ndarray:
    """Traced: complex64 [..., N] -> interleaved float32 [..., 2N]."""
    lead = z.shape[:-1]
    p = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)
    return p.reshape(lead + (2 * z.shape[-1],))


__all__ = ["const_complex", "host_to_payload", "payload_to_host",
           "unpack_complex", "pack_complex"]
