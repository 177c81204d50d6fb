"""Complex phasor rotation (frequency translation) kernels.

The reference implements this with a VOLK rotator / liquid NCO per sample
(/root/reference/radio/blocks/signal/frequencytranslator.lua:32-112).  On TPU
the rotator is a fully parallel elementwise multiply by a precomputed phasor
ramp.  Naively computing exp(j*omega*n) in float32 loses all phase accuracy
for n ~ 1e6 (omega*n ~ 1e7 rad, float32 ulp ~ 1 rad), so the ramp is built
from a **split-index table pair** computed on the host in float64:

    rot[q*K + r] = E1[q] * E2[r],   E1[q] = exp(j*((omega*K*q) mod 2pi))
                                    E2[r] = exp(j*((omega*r)   mod 2pi))

giving ~1e-7 phase error for arbitrarily long chunks.  The carried state is a
single wrapped phase scalar; the per-chunk increment (omega*N mod 2pi) is a
trace-time float64 constant.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from luaradio_tpu.ops.complexutil import const_complex


_K = 1024


class PhasorRamp:
    """Cached phasor ramp tables for a fixed rotation rate."""

    def __init__(self, omega: float):
        self.omega = float(omega)
        self._cache: dict[int, tuple[np.ndarray, float]] = {}

    def _tables(self, n: int):
        if n not in self._cache:
            two_pi = 2 * np.pi
            nq = -(-n // _K)
            r = np.arange(_K, dtype=np.float64)
            q = np.arange(nq, dtype=np.float64)
            e2 = np.exp(1j * np.mod(self.omega * r, two_pi))
            e1 = np.exp(1j * np.mod(self.omega * _K * q, two_pi))
            ramp = (e1[:, None] * e2[None, :]).reshape(-1)[:n]
            dphi = float(np.mod(self.omega * n, two_pi))
            self._cache[n] = (ramp.astype(np.complex64), dphi)
        return self._cache[n]

    def rotate(self, x: jnp.ndarray, phase0):
        """y = x * exp(j*(omega*n + phase0)); returns (y, new_phase)."""
        p, new_phase = self.phasor(x.shape[-1], phase0)
        return x * p, new_phase

    def phasor(self, n: int, phase0):
        """exp(j*(omega*k + phase0)) for k in [0, n); returns (p, new_phase)."""
        ramp, dphi = self._tables(n)
        phase0 = jnp.asarray(phase0, dtype=jnp.float32)
        # complex constants enter via float parts (TPU boundary constraint)
        rot0 = jax.lax.complex(jnp.cos(phase0), jnp.sin(phase0))
        p = const_complex(ramp) * rot0[..., None]
        new_phase = phase0 + np.float32(dphi)
        new_phase = new_phase - np.float32(2 * np.pi) * jnp.round(
            new_phase / np.float32(2 * np.pi))
        return p, new_phase


class FracRamp:
    """Cached phase-position ramp: frac((omega*n + phase0) / 2pi) in [0, 1).

    Used by waveform sources (square/triangle/sawtooth) where the waveform is
    a function of the wrapped phase position.  Same split-index float64 table
    construction as PhasorRamp for long-stream accuracy.
    """

    def __init__(self, omega: float):
        self.omega = float(omega)
        self._cache: dict[int, tuple[np.ndarray, float]] = {}

    def _tables(self, n: int):
        if n not in self._cache:
            two_pi = 2 * np.pi
            f = self.omega / two_pi  # cycles per sample
            nq = -(-n // _K)
            r = np.arange(_K, dtype=np.float64)
            q = np.arange(nq, dtype=np.float64)
            t2 = np.mod(f * r, 1.0)
            t1 = np.mod(f * _K * q, 1.0)
            ramp = np.mod(t1[:, None] + t2[None, :], 1.0).reshape(-1)[:n]
            dphi = float(np.mod(f * n, 1.0))
            self._cache[n] = (ramp.astype(np.float32), dphi)
        return self._cache[n]

    def positions(self, n: int, frac0):
        """Wrapped cycle positions for k in [0, n); frac0 in [0, 1).
        Returns (pos [n] float32 in [0,1), new_frac0)."""
        ramp, dfrac = self._tables(n)
        frac0 = jnp.asarray(frac0, dtype=jnp.float32)
        pos = jnp.asarray(ramp) + frac0[..., None]
        pos = pos - jnp.floor(pos)
        new_frac = frac0 + np.float32(dfrac)
        new_frac = new_frac - jnp.floor(new_frac)
        return pos, new_frac


__all__ = ["PhasorRamp", "FracRamp"]
