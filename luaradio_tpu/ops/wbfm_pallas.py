"""Fully-fused WBFM mono demodulation as ONE Pallas TPU kernel.

The XLA version of the chain (parallel/flagship.py) runs as ~3 fused
passes over HBM: deinterleave matmul -> discriminator (atan2) with the
intermediate stream materialized -> decimating-FIR matmul.  This kernel
does the entire chain per time tile inside VMEM:

    HBM read  : interleaved float32 payload tile (+ filter halo)
    on-core   : deinterleave (MXU selection matmul)
                discriminator (conj-multiply + polynomial atan2, VPU)
                decimating FIR with folded deemphasis (MXU banded matmul)
    HBM write : audio tile (1/D of the input)

= one 8-byte read + one D-th-sized write per complex sample; every
intermediate lives in VMEM.  Grid steps are independent — each tile
re-reads its K-sample halo from HBM (~3-15% read overlap) instead of
carrying state across steps, and the chunk-boundary halo for tile 0
comes from a small carried ref.

Used by parallel/flagship.py on TPU; the XLA path remains the reference
implementation and the CPU fallback.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from luaradio_tpu.ops.pll import _atan2

_LANES = 128


def _deint_matrix() -> np.ndarray:
    s = np.zeros((256, 256), np.float32)
    for j in range(_LANES):
        s[2 * j, j] = 1.0
        s[2 * j + 1, _LANES + j] = 1.0
    return s


def _kernel(halo, tile, d, b, inv_gain,
            x_ref, carry_ref, smat_ref, tmat_ref, out_ref, xw_ref, sem):
    """One time tile for all channels.

    x_ref:     HBM [C, 2T] interleaved payload
    carry_ref: VMEM [C, 2*(halo+1)] chunk-boundary payload history
    smat_ref:  VMEM [256, 256] deinterleave selection matrix
    tmat_ref:  VMEM [W, B] banded decimating tap matrix
    out_ref:   VMEM [C, tile//d] audio tile (auto-written back)
    xw_ref:    VMEM scratch [C, 2*(halo+1+tile)] payload window
    """
    i = pl.program_id(0)
    c = xw_ref.shape[0]
    head = 2 * (halo + 1)          # interleaved history floats

    # ---- load the payload window: [history | tile] ----------------------
    @pl.when(i == 0)
    def _():
        cp0 = pltpu.make_async_copy(carry_ref.at[:, pl.ds(0, head)],
                                    xw_ref.at[:, pl.ds(0, head)], sem)
        cp0.start()
        cp0.wait()

    @pl.when(i > 0)
    def _():
        start = pl.multiple_of(i * 2 * tile - head, 128)
        cp = pltpu.make_async_copy(
            x_ref.at[:, pl.ds(start, head)],
            xw_ref.at[:, pl.ds(0, head)], sem)
        cp.start()
        cp.wait()

    start = pl.multiple_of(i * 2 * tile, 128)
    cp = pltpu.make_async_copy(
        x_ref.at[:, pl.ds(start, 2 * tile)],
        xw_ref.at[:, pl.ds(head, 2 * tile)], sem)
    cp.start()
    cp.wait()

    # ---- deinterleave via MXU selection matmul --------------------------
    n = halo + 1 + tile            # complex samples in the window
    xw = xw_ref[:, :].reshape(c * (2 * n // 256), 256)
    de = jax.lax.dot_general(xw, smat_ref[:, :],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    de = de.reshape(c, 2 * n // 256, 256)
    re = de[:, :, :128].reshape(c, n)
    im = de[:, :, 128:].reshape(c, n)

    # ---- discriminator: arg(x[t] * conj(x[t-1])) / (2 pi gain) ----------
    rp = re[:, :-1]
    ip = im[:, :-1]
    rc = re[:, 1:]
    ic = im[:, 1:]
    tre = rc * rp + ic * ip
    tim = ic * rp - rc * ip
    m = _atan2(tim, tre) * inv_gain          # [c, halo + tile]

    # ---- decimating FIR: batched banded-Toeplitz matmul ------------------
    # y[j] = sum_k h[k] m[halo + j*d - k]; frames of B outputs consume
    # W = B*d + halo + 1 - d samples with hop B*d, starting at 0.
    w = tmat_ref.shape[0]
    bb = b * d
    nf = tile // bb
    pad = (nf + 1) * bb - (halo + tile)
    m2 = jnp.pad(m, ((0, 0), (0, pad))).reshape(c, nf + 1, bb)
    fr = jnp.concatenate([m2[:, :-1, :], m2[:, 1:, :w - bb]], axis=-1)
    y = jax.lax.dot_general(fr.reshape(c * nf, w), tmat_ref[:, :],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    out_ref[:, :] = y.reshape(c, nf * b)


def make_wbfm_pallas(taps: np.ndarray, decimation: int, inv_gain: float,
                     tile: int = 1 << 14, block: int = 128,
                     interpret: bool | None = None):
    """Build fused(carry_pair [C, 2K], x_pair [C, 2T]) ->
    (new_carry, audio [C, T//D]).

    Constraints: len(taps) K must be a multiple of 128 (pad with trailing
    zeros); T a multiple of ``tile``; tile a multiple of block*decimation
    and of the frame window; carry holds the last K complex samples as
    interleaved floats."""
    taps = np.asarray(taps, np.float32)
    k = len(taps)
    if k % 128:
        raise ValueError("len(taps) must be a multiple of 128 (zero-pad)")
    halo = k - 1
    d = decimation
    b = block
    if tile % (b * d):
        raise ValueError("tile must be a multiple of block*decimation")
    from luaradio_tpu.ops.fir import _decim_tap_matrix
    smat = _deint_matrix()
    tmat = _decim_tap_matrix(taps, b, d)
    w = tmat.shape[0]
    if halo > b * d:
        # the in-kernel frame pad is b*d - (K-1); any longer tap vector
        # would pad negatively and fail at trace time
        raise ValueError("taps too long for the frame window; raise block")

    kern = functools.partial(_kernel, halo, tile, d, b, np.float32(inv_gain))
    jtaps = jnp.asarray(taps[::-1].copy())

    def _xla_ref(carry_pair, x_pair):
        """Same math in plain XLA (used when the chunk violates the
        kernel's tiling constraints; also the correctness oracle)."""
        from luaradio_tpu.ops.complexutil import deinterleave
        window = jnp.concatenate([carry_pair, x_pair], axis=-1)
        re, im = deinterleave(window)
        rp, ip = re[:, :-1], im[:, :-1]
        rc, ic = re[:, 1:], im[:, 1:]
        m = jnp.arctan2(ic * rp - rc * ip, rc * rp + ic * ip) * inv_gain
        # y[j] = sum_k h[k] m[halo + j*d - k] == correlate(reversed taps)
        y = jax.lax.conv_general_dilated(
            m[:, None, :], jtaps[None, None, :], (d,), "VALID",
            precision=jax.lax.Precision.HIGHEST)
        return y[:, 0, :]

    def fused(carry_pair, x_pair):
        interp = (jax.default_backend() == "cpu" if interpret is None
                  else interpret)
        c, t2 = x_pair.shape
        t = t2 // 2
        new_carry = x_pair[:, t2 - 2 * (halo + 1):]
        if t % tile:
            return new_carry, _xla_ref(carry_pair, x_pair)
        grid = (t // tile,)
        audio = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),        # x stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),        # carry (DMA'd)
                pl.BlockSpec(memory_space=pltpu.VMEM),    # deint matrix
                pl.BlockSpec(memory_space=pltpu.VMEM),    # tap matrix
            ],
            out_specs=pl.BlockSpec((c, tile // d), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, t // d), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((c, 2 * (halo + 1 + tile)), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interp,
        )(x_pair, carry_pair, jnp.asarray(smat), jnp.asarray(tmat))
        return new_carry, audio

    return fused


__all__ = ["make_wbfm_pallas"]
