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
intermediate lives in VMEM.  Tile windows are DOUBLE-BUFFERED: the DMA
for tile i+1 (payload and its halo head) is issued before tile i's
compute, so HBM reads overlap the MXU/VPU work.  The chunk-boundary
halo for tile 0 comes from a small carried ref.

MXU emulation strategy (measured on v5e, round 5 — see
ROOFLINE_r05.json): the binding resource is the MXU running f32-exact
emulated matmuls, not HBM and not the VPU atan2.

* deinterleave: the selection matrix is 0/1 (exact in bf16), so an
  exact 3-term bf16 decomposition of the payload (x = hi + mid + lo,
  24 mantissa bits total) gives BIT-EXACT f32 selection in 3 MXU passes
  instead of Precision.HIGHEST's 6.  Exactness here is load-bearing:
  atan2 sits right behind, and near the +-pi branch cut a 2^-17
  perturbation of re/im flips the angle by ~2*pi.
* decimating FIR: 2-term splits of both operands with the lo*lo term
  dropped (XLA's HIGH algorithm, which Mosaic cannot lower natively):
  3 passes, ~2^-17 relative error on the smooth post-atan2 stream —
  ~5e-6 of full scale on the audio, far inside the 2e-5 test tolerance.
  ``fir_exact=True`` restores 6-pass HIGHEST.

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


def _bf_dot(a, b):
    """One bf16 MXU pass with f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dot_sel3(x, s):
    """x @ s for a bf16-exact (0/1) matrix s: exact f32 in 3 bf16 passes.

    x = hi + mid + lo with each term bf16-representable covers all 24
    f32 mantissa bits; each pass is exact, and the selection structure
    makes the final sums exact re-assemblies of the split."""
    x_hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - x_hi
    x_mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    x_lo = r1 - x_mid
    return _bf_dot(x_hi, s) + _bf_dot(x_mid, s) + _bf_dot(x_lo, s)


def _dot_split22(x, s):
    """x @ s in 3 bf16 passes: 2-term splits of both operands, lo*lo
    dropped (~2^-17 relative — the HIGH algorithm, hand-lowered)."""
    x_hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    x_lo = x - x_hi
    s_hi = s.astype(jnp.bfloat16).astype(jnp.float32)
    s_lo = s - s_hi
    return _bf_dot(x_hi, s_hi) + _bf_dot(x_lo, s_hi) + _bf_dot(x_hi, s_lo)


def _dot_highest(x, s):
    return jax.lax.dot_general(x, s,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _kernel(halo, tile, d, b, inv_gain, nsteps, fir_exact,
            x_ref, carry_ref, smat_ref, tmat_ref, out_ref, win_ref,
            sems, hsems):
    """One time tile for all channels.

    x_ref:     HBM [C, 2T] interleaved payload
    carry_ref: HBM [C, 2*(halo+1)] chunk-boundary payload history
    smat_ref:  VMEM [256, 256] deinterleave selection matrix
    tmat_ref:  VMEM [W, B] banded decimating tap matrix
    out_ref:   VMEM [C, tile//d] audio tile (auto-written back)
    win_ref:   VMEM [2, C, 2*(halo+1+tile)] double-buffered [head|tile]
               payload windows; DMAs land here directly
    """
    i = pl.program_id(0)
    c = win_ref.shape[1]
    head = 2 * (halo + 1)
    slot = i % 2

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(x_ref.at[:, pl.ds(0, 2 * tile)],
                              win_ref.at[0, :, pl.ds(head, 2 * tile)],
                              sems.at[0]).start()
        pltpu.make_async_copy(carry_ref.at[:, pl.ds(0, head)],
                              win_ref.at[0, :, pl.ds(0, head)],
                              hsems.at[0]).start()

    @pl.when(i + 1 < nsteps)
    def _():
        nslot = (i + 1) % 2
        nxt = pl.multiple_of((i + 1) * 2 * tile, 128)
        pltpu.make_async_copy(x_ref.at[:, pl.ds(nxt, 2 * tile)],
                              win_ref.at[nslot, :, pl.ds(head, 2 * tile)],
                              sems.at[nslot]).start()
        hstart = pl.multiple_of((i + 1) * 2 * tile - head, 128)
        pltpu.make_async_copy(x_ref.at[:, pl.ds(hstart, head)],
                              win_ref.at[nslot, :, pl.ds(0, head)],
                              hsems.at[nslot]).start()

    # wait for this tile's payload + head (size-matched descriptors)
    pltpu.make_async_copy(x_ref.at[:, pl.ds(0, 2 * tile)],
                          win_ref.at[slot, :, pl.ds(head, 2 * tile)],
                          sems.at[slot]).wait()
    pltpu.make_async_copy(x_ref.at[:, pl.ds(0, head)],
                          win_ref.at[slot, :, pl.ds(0, head)],
                          hsems.at[slot]).wait()

    # ---- deinterleave via exact 3-pass MXU selection matmul -------------
    n = halo + 1 + tile            # complex samples in the window
    xw = win_ref[slot, :, :].reshape(c * (2 * n // 256), 256)
    de = _dot_sel3(xw, smat_ref[:, :])
    de = de.reshape(c, 2 * n // 256, 256)
    re = de[:, :, :_LANES].reshape(c, n)
    im = de[:, :, _LANES:].reshape(c, n)

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
    fir_dot = _dot_highest if fir_exact else _dot_split22
    y = fir_dot(fr.reshape(c * nf, w), tmat_ref[:, :])
    out_ref[:, :] = y.reshape(c, nf * b)


def make_wbfm_pallas(taps: np.ndarray, decimation: int, inv_gain: float,
                     tile: int = 1 << 14, block: int = 128,
                     interpret: bool | None = None,
                     fir_exact: bool = False):
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
    if halo > b * d:
        # the in-kernel frame pad is b*d - (K-1); any longer tap vector
        # would pad negatively and fail at trace time
        raise ValueError("taps too long for the frame window; raise block")

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
        nsteps = t // tile
        kern = functools.partial(_kernel, halo, tile, d, b,
                                 np.float32(inv_gain), nsteps, fir_exact)
        audio = pl.pallas_call(
            kern,
            grid=(nsteps,),
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
                pltpu.VMEM((2, c, 2 * (halo + 1 + tile)), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interp,
        )(x_pair, carry_pair, jnp.asarray(smat), jnp.asarray(tmat))
        return new_carry, audio

    return fused


def _planar_kernel(halo, tile, d, b, inv_gain, nsteps, fir_exact,
                   re_ref, im_ref, cre_ref, cim_ref, tmat_ref, out_ref,
                   win_ref, sems, hsems):
    """Discriminator + decimating FIR on PLANAR (re, im) streams.

    The in-graph variant of :func:`_kernel`: inside a fused XLA program
    complex64 is already stored as separate float planes, so there is no
    deinterleave to do at all — the kernel's only stages are the VPU
    conj-multiply + atan2 and the MXU banded FIR, one HBM read per
    sample, one D-th write, intermediates in VMEM.

    win_ref: VMEM [2 slots, 2 planes, C, (halo+1+tile)] double-buffered
    [head | tile] windows; sems/hsems: [slot, plane] DMA semaphores.
    """
    i = pl.program_id(0)
    c = win_ref.shape[2]
    head = halo + 1
    slot = i % 2

    def start(slot_, plane, src_ref, carry_src, idx):
        pltpu.make_async_copy(
            src_ref.at[:, pl.ds(idx * tile, tile)],
            win_ref.at[slot_, plane, :, pl.ds(head, tile)],
            sems.at[slot_, plane]).start()
        if carry_src is not None:
            pltpu.make_async_copy(carry_src.at[:, pl.ds(0, head)],
                                  win_ref.at[slot_, plane, :,
                                             pl.ds(0, head)],
                                  hsems.at[slot_, plane]).start()
        else:
            hstart = pl.multiple_of(idx * tile - head, 128)
            pltpu.make_async_copy(src_ref.at[:, pl.ds(hstart, head)],
                                  win_ref.at[slot_, plane, :,
                                             pl.ds(0, head)],
                                  hsems.at[slot_, plane]).start()

    @pl.when(i == 0)
    def _():
        start(0, 0, re_ref, cre_ref, 0)
        start(0, 1, im_ref, cim_ref, 0)

    @pl.when(i + 1 < nsteps)
    def _():
        start((i + 1) % 2, 0, re_ref, None, i + 1)
        start((i + 1) % 2, 1, im_ref, None, i + 1)

    for plane, src in ((0, re_ref), (1, im_ref)):
        pltpu.make_async_copy(src.at[:, pl.ds(0, tile)],
                              win_ref.at[slot, plane, :, pl.ds(head, tile)],
                              sems.at[slot, plane]).wait()
        pltpu.make_async_copy(src.at[:, pl.ds(0, head)],
                              win_ref.at[slot, plane, :, pl.ds(0, head)],
                              hsems.at[slot, plane]).wait()

    re = win_ref[slot, 0]
    im = win_ref[slot, 1]
    rp = re[:, :-1]
    ip = im[:, :-1]
    rc = re[:, 1:]
    ic = im[:, 1:]
    tre = rc * rp + ic * ip
    tim = ic * rp - rc * ip
    m = _atan2(tim, tre) * inv_gain          # [c, halo + tile]

    w = tmat_ref.shape[0]
    bb = b * d
    nf = tile // bb
    pad = (nf + 1) * bb - (halo + tile)
    m2 = jnp.pad(m, ((0, 0), (0, pad))).reshape(c, nf + 1, bb)
    fr = jnp.concatenate([m2[:, :-1, :], m2[:, 1:, :w - bb]], axis=-1)
    fir_dot = _dot_highest if fir_exact else _dot_split22
    y = fir_dot(fr.reshape(c * nf, w), tmat_ref[:, :])
    out_ref[:, :] = y.reshape(c, nf * b)


def make_disc_fir_pallas(taps: np.ndarray, decimation: int, inv_gain: float,
                         tile: int | None = None, block: int = 128,
                         interpret: bool | None = None,
                         fir_exact: bool = False):
    """Build fused(carry_re [C, K], carry_im [C, K], re [C, T], im [C, T])
    -> audio [C, T//D]: frequency discriminator + decimating FIR in one
    VMEM pass (the in-graph planar form of :func:`make_wbfm_pallas`; the
    caller keeps the complex carry and passes its planes).

    Same constraints: len(taps) K a multiple of 128; chunks whose T is
    not a multiple of ``tile`` run the identical math in plain XLA."""
    taps = np.asarray(taps, np.float32)
    k = len(taps)
    if k % 128:
        raise ValueError("len(taps) must be a multiple of 128 (zero-pad)")
    halo = k - 1
    d = decimation
    b = block
    if tile is None:
        tile = b * d * 16
    if tile % (b * d):
        raise ValueError("tile must be a multiple of block*decimation")
    from luaradio_tpu.ops.fir import _decim_tap_matrix
    tmat = _decim_tap_matrix(taps, b, d)
    if halo > b * d:
        raise ValueError("taps too long for the frame window; raise block")

    jtaps = jnp.asarray(taps[::-1].copy())

    def _xla_ref(cre, cim, re, im):
        rw = jnp.concatenate([cre, re], axis=-1)
        iw = jnp.concatenate([cim, im], axis=-1)
        rp, ip = rw[:, :-1], iw[:, :-1]
        rc, ic = rw[:, 1:], iw[:, 1:]
        m = jnp.arctan2(ic * rp - rc * ip, rc * rp + ic * ip) * inv_gain
        y = jax.lax.conv_general_dilated(
            m[:, None, :], jtaps[None, None, :], (d,), "VALID",
            precision=jax.lax.Precision.HIGHEST)
        return y[:, 0, :]

    def fused(carry_re, carry_im, re, im):
        interp = (jax.default_backend() == "cpu" if interpret is None
                  else interpret)
        c, t = re.shape
        if t % tile:
            return _xla_ref(carry_re, carry_im, re, im)
        nsteps = t // tile
        kern = functools.partial(_planar_kernel, halo, tile, d, b,
                                 np.float32(inv_gain), nsteps, fir_exact)
        return pl.pallas_call(
            kern,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 + [
                pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((c, tile // d), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, t // d), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 2, c, halo + 1 + tile), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interp,
        )(re, im, carry_re, carry_im, jnp.asarray(tmat))

    return fused


__all__ = ["make_wbfm_pallas", "make_disc_fir_pallas"]
