"""FIR filtering kernels.

The reference's FIRFilterBlock is its most important kernel
(/root/reference/radio/blocks/signal/firfilter.lua): a stateful sliding-window
dot product (VOLK/liquid SIMD, :111-307) and an FFT overlap-save path
(:313-492) for long filters.

TPU-native design:

* ``fir_direct`` — causal convolution y[n] = sum_k taps[k] x[n-k] with the
  last M-1 input samples carried as explicit state.  Lowered through
  ``lax.conv_general_dilated`` (XLA tiles it onto the MXU via implicit
  im2col); complex arithmetic is decomposed into real channel convolutions
  because TPU convs are real-valued.

* ``fir_fft`` — overlap-save block convolution on frames of N = 2L with hop
  L: frames are built with a single reshape+concat (no gather), transformed
  with batched ``jnp.fft``, multiplied by the precomputed tap response, and
  inverse-transformed; samples [L:2L) of each frame are the valid outputs.
  Unlike the reference (which emits chunked/delayed output, firfilter.lua
  :361-398), the carried state is the last L input samples so each call
  returns exactly len(x) aligned outputs — streaming-state semantics match
  the direct path bit-for-bit within FFT rounding.

All kernels treat the **last axis as time** and broadcast over leading batch
axes (that is what the channel-parallel sharding in luaradio_tpu.parallel
vmaps/shard_maps over).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


#: Output frame hop of the matmul formulation; (B + M - 1, B) tap matrices
#: tile the 128x128 MXU exactly.
_FRAME_B = 128


def _toeplitz_taps(h: np.ndarray | jnp.ndarray, b: int) -> jnp.ndarray:
    """Banded Toeplitz matrix T [b+M-1, b] with T[c, j] = h[M-1 + j - c]
    (zero outside the band), so frames @ T computes the causal FIR."""
    h = jnp.asarray(h)
    m = h.shape[0]
    c = jnp.arange(b + m - 1)[:, None]
    j = jnp.arange(b)[None, :]
    k = (m - 1) + j - c
    hpad = jnp.concatenate([h, jnp.zeros((1,), h.dtype)])
    return hpad[jnp.clip(k, 0, m)] * ((k >= 0) & (k < m))


def _frames(xin: jnp.ndarray, b: int, p: int, nf: int) -> jnp.ndarray:
    """Overlapping frames [..., nf, b+p] with hop b from xin [..., nf*b+p]
    via reshape+concat (no gather).  Requires p <= b."""
    lead = xin.shape[:-1]
    pad = jnp.zeros(lead + (b - p,), xin.dtype)
    x2 = jnp.concatenate([xin, pad], axis=-1).reshape(lead + (nf + 1, b))
    return jnp.concatenate([x2[..., :-1, :], x2[..., 1:, :p]], axis=-1)


def _conv_valid(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Real 'valid' causal convolution: x [..., N+M-1] real, h [M] real ->
    [..., N].

    TPU-native formulation: frame the input into [N/B, B+M-1] overlapping
    frames (reshape+concat, no gather) and multiply by the banded Toeplitz
    tap matrix on the MXU.  A conv_general_dilated with a size-1 channel dim
    lays out [*, 1, N] catastrophically on TPU (128x padding); the framed
    matmul tiles the MXU exactly with <=2x FLOP overhead for M <= 129.
    """
    m = h.shape[0]
    p = m - 1
    n = x.shape[-1] - p
    lead = x.shape[:-1]
    b = _FRAME_B
    if p > b or n < 2 * b:
        # tall filters / tiny chunks: fall back to a dot over shifted slices
        y = jnp.zeros(lead + (n,), x.dtype)
        for k in range(m):
            y = y + h[m - 1 - k] * x[..., k:k + n]
        return y
    nf = -(-n // b)
    xin = x
    if nf * b != n:  # pad to a whole number of frames
        xin = jnp.concatenate(
            [x, jnp.zeros(lead + (nf * b - n,), x.dtype)], axis=-1)
    fr = _frames(xin, b, p, nf)
    t = _toeplitz_taps(h, b).astype(x.dtype)
    y = jnp.einsum("...fc,cb->...fb", fr, t,
                   precision=lax.Precision.HIGHEST)
    return y.reshape(lead + (nf * b,))[..., :n]


def _conv_valid_2ch(xr, xi, hr, hi) -> jnp.ndarray:
    """conv(xr, hr) + conv(xi, hi), fused as one matmul with stacked
    Toeplitz tap matrices."""
    m = hr.shape[0]
    p = m - 1
    n = xr.shape[-1] - p
    lead = xr.shape[:-1]
    b = _FRAME_B
    if p > b or n < 2 * b:
        return _conv_valid(xr, hr) + _conv_valid(xi, hi)
    nf = -(-n // b)
    if nf * b != n:
        pad = jnp.zeros(lead + (nf * b - n,), xr.dtype)
        xr = jnp.concatenate([xr, pad], axis=-1)
        xi = jnp.concatenate([xi, pad], axis=-1)
    fr = jnp.concatenate([_frames(xr, b, p, nf), _frames(xi, b, p, nf)],
                         axis=-1)
    t = jnp.concatenate([_toeplitz_taps(hr, b), _toeplitz_taps(hi, b)],
                        axis=0).astype(xr.dtype)
    y = jnp.einsum("...fc,cb->...fb", fr, t,
                   precision=lax.Precision.HIGHEST)
    return y.reshape(lead + (nf * b,))[..., :n]


def fir_init_state(num_taps: int, dtype, batch_shape: tuple = ()) -> jnp.ndarray:
    """Carried state: the last M-1 input samples (zeros initially — the
    reference also starts its sliding window at zero, firfilter.lua:115)."""
    return jnp.zeros(batch_shape + (num_taps - 1,), dtype=dtype)


def fir_direct(x: jnp.ndarray, taps: jnp.ndarray, tail: jnp.ndarray):
    """Causal FIR via direct convolution.

    x: [..., N]; taps: [M] (real or complex); tail: [..., M-1] carried input.
    Returns (y [..., N], new_tail [..., M-1]).
    """
    taps = jnp.asarray(taps)
    m = taps.shape[0]
    xin = jnp.concatenate([tail.astype(x.dtype), x], axis=-1) if m > 1 else x
    x_c = jnp.iscomplexobj(x)
    t_c = jnp.iscomplexobj(taps)
    if not x_c and not t_c:
        y = _conv_valid(xin, taps)
    elif x_c and not t_c:
        yr = _conv_valid(xin.real, taps)
        yi = _conv_valid(xin.imag, taps)
        y = lax.complex(yr, yi)
    elif x_c and t_c:
        hr, hi = taps.real, taps.imag
        yr = _conv_valid_2ch(xin.real, xin.imag, hr, -hi)
        yi = _conv_valid_2ch(xin.real, xin.imag, hi, hr)
        y = lax.complex(yr, yi)
    else:  # real input, complex taps -> complex output
        yr = _conv_valid(xin, taps.real)
        yi = _conv_valid(xin, taps.imag)
        y = lax.complex(yr, yi)
    new_tail = xin[..., xin.shape[-1] - (m - 1):] if m > 1 else tail
    return y, new_tail


# ---------------------------------------------------------------------------
# Decimating FIR (polyphase framed matmul)
# ---------------------------------------------------------------------------
#
# The graph optimizer (core/optimize.py) fuses FIR -> Downsampler(D) chains
# into one decimating FIR: only every D-th convolution output is computed,
# as a framed matmul of B outputs at a time against a banded tap matrix —
# a D-fold FLOP reduction over filter-then-discard, and the matmul tiles
# the MXU exactly.  The reference has no analog (its pipeline computes the
# full-rate FIR and throws 1-1/D of it away in the downsampler process).

def _decim_tap_matrix(h: np.ndarray, b: int, d: int) -> np.ndarray:
    """Tap matrix T [(b-1)*d + K (padded to b*d + P), b] with
    T[j*d + K-1 - k, j] = h[k], so frames @ T yields every d-th causal
    convolution output."""
    h = np.asarray(h)
    k = h.shape[0]
    w = b * d + max(k - d, 0)
    t = np.zeros((w, b), h.dtype)
    for j in range(b):
        t[j * d + k - 1:j * d - 1 if j * d >= 1 else None:-1, j] = h
    return t


def fir_decimate_init_state(num_taps: int, dtype, batch_shape: tuple = ()):
    return jnp.zeros(batch_shape + (max(num_taps - 1, 0),), dtype=dtype)


def decim_block_size(d: int) -> int:
    """Output-frame height for the decimating matmul: larger frames
    amortize the (K-1)-sample halo (the frame-build read amplification is
    1 + (K-1)/(B*d)), bounded so the tap matrix stays a few MB of VMEM."""
    return 512 if d == 1 else (256 if d <= 4 else 128)


def _fir_decimate_real(x: jnp.ndarray, tmat: jnp.ndarray, k: int, d: int):
    """x [..., (K-1) + N] real (tail prepended), tmat from _decim_tap_matrix.
    Returns y [..., N//d]."""
    b = tmat.shape[1]
    w = tmat.shape[0]
    p = w - b * d
    lead = x.shape[:-1]
    n = x.shape[-1] - (k - 1)
    n_out = n // d
    nf = -(-n_out // b)
    bb = b * d
    need = nf * bb + p
    xin = x
    if xin.shape[-1] < need:
        xin = jnp.concatenate(
            [xin, jnp.zeros(lead + (need - xin.shape[-1],), x.dtype)],
            axis=-1)
    else:
        xin = xin[..., :need]
    x2 = jnp.concatenate(
        [xin, jnp.zeros(lead + ((nf + 1) * bb - need,), x.dtype)],
        axis=-1).reshape(lead + (nf + 1, bb))
    fr = jnp.concatenate([x2[..., :-1, :], x2[..., 1:, :p]], axis=-1) \
        if p else x2[..., :-1, :]
    y = jnp.einsum("...fw,wb->...fb", fr, tmat,
                   precision=lax.Precision.HIGHEST)
    return y.reshape(lead + (nf * b,))[..., :n_out]


def fir_decimate(x: jnp.ndarray, taps: jnp.ndarray | np.ndarray,
                 tail: jnp.ndarray, d: int, block: int = 128):
    """Fused causal FIR + decimate-by-d: y[j] = sum_k h[k] x[j*d - k].

    x: [..., N] with N % d == 0 (real or complex); taps [K] (real or
    complex, K <= block*d + d); tail: [..., K-1] carried input samples.
    Returns (y [..., N // d], new_tail).
    """
    taps_np = np.asarray(taps)
    k = taps_np.shape[0]
    if k > block * d + d:
        raise ValueError(f"fir_decimate: taps {k} too long for block {block} "
                         f"x decimation {d}")
    xin = jnp.concatenate([tail.astype(x.dtype), x], axis=-1) if k > 1 else x
    x_c = jnp.iscomplexobj(x)
    t_c = np.iscomplexobj(taps_np)
    if not t_c:
        tmat = jnp.asarray(_decim_tap_matrix(
            taps_np.astype(np.float32), block, d))
        if x_c:
            yr = _fir_decimate_real(xin.real, tmat, k, d)
            yi = _fir_decimate_real(xin.imag, tmat, k, d)
            y = lax.complex(yr, yi)
        else:
            y = _fir_decimate_real(xin, tmat, k, d)
    else:
        tr = jnp.asarray(_decim_tap_matrix(
            taps_np.real.astype(np.float32), block, d))
        ti = jnp.asarray(_decim_tap_matrix(
            taps_np.imag.astype(np.float32), block, d))
        if x_c:
            xr, xi = xin.real, xin.imag
            yr = (_fir_decimate_real(xr, tr, k, d)
                  - _fir_decimate_real(xi, ti, k, d))
            yi = (_fir_decimate_real(xr, ti, k, d)
                  + _fir_decimate_real(xi, tr, k, d))
        else:
            yr = _fir_decimate_real(xin, tr, k, d)
            yi = _fir_decimate_real(xin, ti, k, d)
        y = lax.complex(yr, yi)
    new_tail = xin[..., xin.shape[-1] - (k - 1):] if k > 1 else tail
    return y, new_tail


# ---------------------------------------------------------------------------
# Tap algebra (graph-optimizer helpers, host-side float64)
# ---------------------------------------------------------------------------

def combine_taps(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Taps of the cascade of two FIR filters (= convolution of taps)."""
    return np.convolve(np.asarray(h1, dtype=np.complex128 if
                                  (np.iscomplexobj(h1) or np.iscomplexobj(h2))
                                  else np.float64),
                       np.asarray(h2, dtype=np.complex128 if
                                  (np.iscomplexobj(h1) or np.iscomplexobj(h2))
                                  else np.float64))


def iir_to_fir_taps(b_taps: np.ndarray, a_taps: np.ndarray,
                    tol: float = 1e-9, max_len: int = 4096):
    """Truncated impulse response of a stable IIR b/a, or None if the filter
    does not decay below ``tol`` (relative to its peak) within ``max_len``
    samples.  Used by the graph optimizer to fold short IIRs (deemphasis,
    single-pole filters) into neighboring FIR stages within float32 noise."""
    b = np.asarray(b_taps, dtype=np.float64)
    a = np.asarray(a_taps, dtype=np.float64)
    import scipy.signal
    impulse = np.zeros(max_len)
    impulse[0] = 1.0
    h = scipy.signal.lfilter(b, a, impulse)
    peak = np.max(np.abs(h))
    if peak == 0:
        return np.zeros(1, np.float64)
    idx = np.nonzero(np.abs(h) > tol * peak)[0]
    if len(idx) == 0:
        return np.zeros(1, np.float64)
    last = idx[-1]
    if last >= max_len - 1:
        return None  # did not decay; not representable
    return h[:last + 1]


# ---------------------------------------------------------------------------
# FFT overlap-save
# ---------------------------------------------------------------------------

def fft_frame_length(num_taps: int, min_l: int = 1024) -> int:
    """Frame hop L (power of two >= max(min_l, next_pow2(4*M))); FFT size is
    2L.  Input chunks must be a multiple of L."""
    l = min_l
    while l < 4 * num_taps:
        l *= 2
    return l


def fir_fft_freq_taps(taps: np.ndarray, l: int, real_input: bool) -> np.ndarray:
    """Precompute the tap frequency response at FFT size 2L (float64 on host)."""
    n = 2 * l
    taps = np.asarray(taps, dtype=np.complex128 if np.iscomplexobj(taps)
                      else np.float64)
    if real_input and not np.iscomplexobj(taps):
        return np.fft.rfft(taps, n).astype(np.complex64)
    return np.fft.fft(taps, n).astype(np.complex64)


def fir_fft_init_state(l: int, dtype, batch_shape: tuple = ()) -> jnp.ndarray:
    return jnp.zeros(batch_shape + (l,), dtype=dtype)


def fir_fft(x: jnp.ndarray, h_freq: jnp.ndarray, tail: jnp.ndarray,
            real_in_real_taps: bool):
    """Overlap-save FFT convolution.

    x: [..., N] with N % L == 0; h_freq: precomputed rfft/fft of taps at 2L;
    tail: [..., L] last L input samples.  Returns (y [..., N], new_tail).
    """
    l = tail.shape[-1]
    n = x.shape[-1]
    assert n % l == 0, f"chunk {n} not a multiple of frame hop {l}"
    nb = n // l
    xin = jnp.concatenate([tail.astype(x.dtype), x], axis=-1)
    lead = xin.shape[:-1]
    x2 = xin.reshape(lead + (nb + 1, l))
    frames = jnp.concatenate([x2[..., :-1, :], x2[..., 1:, :]], axis=-1)
    if real_in_real_taps:
        spec = jnp.fft.rfft(frames, axis=-1)
        yf = jnp.fft.irfft(spec * h_freq, n=2 * l, axis=-1)
    else:
        spec = jnp.fft.fft(frames, axis=-1)
        yf = jnp.fft.ifft(spec * h_freq, axis=-1)
        if not jnp.iscomplexobj(x) and not jnp.iscomplexobj(h_freq):
            yf = yf.real
    y = yf[..., l:].reshape(lead + (n,))
    new_tail = x[..., n - l:]
    out_dtype = x.dtype if real_in_real_taps else jnp.complex64
    return y.astype(out_dtype), new_tail


__all__ = [
    "fir_direct", "fir_init_state",
    "fir_fft", "fir_fft_freq_taps", "fir_fft_init_state", "fft_frame_length",
]
