"""Spectrum utilities: DFT / IDFT / PSD / fftshift.

The reference implements these with a four-way backend dispatch
(FFTW3F > liquid > VOLK > pure Lua,
/root/reference/radio/utilities/spectrum_utils.lua:69-246) chosen at module
load.  On TPU there is exactly one backend: XLA's fused FFT (jnp.fft), which
is batched over leading axes and runs on-device.  The windowed-periodogram
PSD (spectrum_utils.lua:513-642) becomes a single batched expression.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from luaradio_tpu.utils.window import window as make_window


def dft(x, n: int | None = None):
    """Forward DFT along the last axis (complex in/out)."""
    return jnp.fft.fft(jnp.asarray(x), n=n, axis=-1)


def idft(x, n: int | None = None):
    """Inverse DFT along the last axis."""
    return jnp.fft.ifft(jnp.asarray(x), n=n, axis=-1)


def fftshift(x):
    """Swap halves so DC sits at the center
    (reference spectrum_utils.lua:654-667)."""
    return jnp.fft.fftshift(jnp.asarray(x), axes=-1)


def fftfreq(n: int, rate: float) -> np.ndarray:
    return np.fft.fftfreq(n, d=1.0 / rate)


class PSD:
    """Windowed-periodogram power spectral density estimator.

    Mirrors the reference's PSD contract (spectrum_utils.lua:513-642):
    num_samples-point window (periodic variant), magnitude-squared DFT
    normalized by the window energy and sample rate, optional log10 dB
    output.  Batched: input [..., num_samples] -> output [..., num_samples].
    """

    def __init__(self, num_samples: int, window_type: str = "hanning",
                 sample_rate: float = 1.0, logarithmic: bool = True):
        self.num_samples = num_samples
        self.sample_rate = sample_rate
        self.logarithmic = logarithmic
        w = make_window(num_samples, window_type, periodic=True)
        self.window = w.astype(np.float32)
        # normalization: window energy * Fs  (Welch periodogram scaling)
        self.scale = np.float32(np.sum(w * w) * sample_rate)

    def compute(self, x):
        x = jnp.asarray(x)
        xw = x * jnp.asarray(self.window)
        spec = jnp.fft.fft(xw, axis=-1)
        psd = (jnp.abs(spec) ** 2) / self.scale
        if self.logarithmic:
            psd = 10.0 * jnp.log10(psd + np.float32(1e-30))
        return psd.astype(jnp.float32)


__all__ = ["dft", "idft", "fftshift", "fftfreq", "PSD"]
