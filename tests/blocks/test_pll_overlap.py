"""Tests for the unlocked-PLL parallel paths: the overlap-and-discard
batched scan (ops/pll_overlap.py) and the Newton segment solver
(ops/pll_linear.py pll_newton_segment).

Oracle: the reference's per-sample loop (pll.lua:138-167) in float64.
The key physical boundary: a carrier-bearing input synchronizes (the loop
is contractive, so warm-up segments converge and the boundary check
passes); a pure-noise input is diffusive (two trajectories never merge)
and MUST be rejected so the hybrid falls back to the exact sequential
kernel — correctness by validation, not hope.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from luaradio_tpu import PLLBlock
from luaradio_tpu.ops.pll_linear import pll_newton_segment
from luaradio_tpu.ops.pll_overlap import plan_overlap, pll_overlap_discard
from luaradio_tpu.types import ComplexFloat32
from tests.jig import prepare_block, run_block

RNG = np.random.default_rng(17)


def pll_oracle(x, state, alpha, beta, fmin, fmax, mult):
    phi_l, phi_m, freq = [float(s) for s in state]
    out = np.zeros(len(x), np.complex128)
    err = np.zeros(len(x))
    for i, xi in enumerate(x.astype(np.complex128)):
        out[i] = np.exp(1j * phi_m)
        err[i] = np.angle(xi * np.exp(-1j * phi_l)) if xi != 0 else 0.0
        freq += beta * err[i]
        phi_l += freq + alpha * err[i]
        phi_m += freq * mult + alpha * err[i]
        freq = min(max(freq, fmin), fmax)
    return out, err, (phi_l, phi_m, freq)


def _bench_params():
    """The benchmark PLL: 1 kHz loop at 1 MS/s, band [200, 220] kHz."""
    blk = prepare_block(PLLBlock(1e3, 200e3, 220e3, multiplier=1.0),
                        [ComplexFloat32], rate=1e6)
    return (float(blk._alpha), float(blk._beta),
            float(blk._freq_min), float(blk._freq_max))


def test_overlap_acquisition_matches_oracle():
    """Cold-start acquisition of a noisy in-band tone: the batched scan
    must validate and match the sequential loop."""
    alpha, beta, fmin, fmax = _bench_params()
    n = 1 << 16
    x = (np.exp(1j * (2 * np.pi * 0.21 * np.arange(n) + 0.5))
         + 0.3 * (RNG.standard_normal(n) + 1j * RNG.standard_normal(n))
         ).astype(np.complex64)
    st = (np.float32(0.3), np.float32(0.1), np.float32((fmin + fmax) / 2))
    lseg, warm = plan_overlap(n, alpha)
    ok, new_state, out, err = pll_overlap_discard(
        jnp.asarray(x), st, alpha, beta, fmin, fmax, 1, lseg, warm)
    assert bool(ok)
    oout, oerr, ost = pll_oracle(x, st, alpha, beta, fmin, fmax, 1)
    assert np.max(np.abs(np.asarray(out) - oout)) < 2e-2
    assert np.max(np.abs(np.asarray(err) - oerr)) < 2e-2
    assert abs(float(new_state[2]) - ost[2]) < 1e-4


def test_overlap_rejects_pure_noise():
    """Pure noise is diffusive — the boundary check must fail so the
    hybrid uses the exact sequential kernel."""
    alpha, beta, fmin, fmax = _bench_params()
    n = 1 << 15
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
         ).astype(np.complex64)
    st = (np.float32(0.0), np.float32(0.0), np.float32((fmin + fmax) / 2))
    lseg, warm = plan_overlap(n, alpha)
    ok, _, _, _ = pll_overlap_discard(
        jnp.asarray(x), st, alpha, beta, fmin, fmax, 1, lseg, warm)
    assert not bool(ok)


def test_plan_overlap_edges():
    assert plan_overlap(700, 0.2) is None          # no pow2 divisor fits
    assert plan_overlap(1 << 16, 0.0) is None      # degenerate loop
    plan = plan_overlap(1 << 22, 0.0166)
    assert plan is not None
    lseg, warm = plan
    assert (1 << 22) % lseg == 0 and warm <= lseg


def test_pll_block_on_noise_is_chunk_invariant():
    """End-to-end: PLLBlock fed pure noise must stay exactly equivalent
    across chunk splits (the rejected batched path never leaks through)."""
    blk = prepare_block(PLLBlock(1e3, 200e3, 220e3, multiplier=1.0),
                        [ComplexFloat32], rate=1e6)
    n = 8192
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
         ).astype(np.complex64)
    out, err = run_block(blk, [x], splits=(2048, 4096))
    exp_out, exp_err, _ = pll_oracle(
        x, (0.0, 0.0, (blk._freq_min + blk._freq_max) / 2),
        blk._alpha, blk._beta, blk._freq_min, blk._freq_max, 1.0)
    assert np.max(np.abs(out - exp_out)) < 2e-2
    assert np.max(np.abs(err - exp_err)) < 2e-2


def test_newton_segment_exact_on_acquisition():
    """The Newton solver's envelope: a phase-step transient on a tone near
    the loop frequency converges to the exact fixed point; on pure noise
    (wrap-branch chatter) its self-consistency guard rejects."""
    alpha, beta, fmin, fmax = _bench_params()
    n = 1024
    st = (np.float32(0.7), np.float32(0.2), np.float32((fmin + fmax) / 2))
    tone = np.exp(1j * 2 * np.pi * 0.21 * np.arange(n)).astype(np.complex64)
    ok, new_state, out, err = pll_newton_segment(
        jnp.asarray(tone), st, alpha, beta, fmin, fmax, 1)
    assert bool(ok)
    oout, oerr, ost = pll_oracle(tone, st, alpha, beta, fmin, fmax, 1)
    assert np.max(np.abs(np.asarray(out) - oout)) < 2e-3
    assert np.max(np.abs(np.asarray(err) - oerr)) < 2e-3

    noise = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
             ).astype(np.complex64)
    ok, _, _, _ = pll_newton_segment(
        jnp.asarray(noise), st, alpha, beta, fmin, fmax, 1)
    assert not bool(ok)


def test_pll_exact_option_forces_sequential():
    """PLLBlock(exact=True) must be bit-identical to the sequential kernel
    on a weak-carrier acquisition chunk where the default hybrid would use
    the approximate overlap-and-discard tier."""
    n = 8192
    t = np.arange(n)
    x = (0.4 * np.exp(1j * (2 * np.pi * 0.208 * t + 1.1))
         + 0.4 * (RNG.standard_normal(n) + 1j * RNG.standard_normal(n))
         ).astype(np.complex64)

    def run(**kw):
        blk = prepare_block(PLLBlock(1e3, 200e3, 220e3, **kw),
                            [ComplexFloat32], rate=1e6)
        return run_block(blk, [x])

    out_exact, err_exact = run(exact=True)
    # the exact path == the pure scan kernel (float32 sequential oracle)
    blk = prepare_block(PLLBlock(1e3, 200e3, 220e3), [ComplexFloat32],
                        rate=1e6)
    _, (out_seq, err_seq) = blk._scan(
        (jnp.float32(0), jnp.float32(0),
         jnp.float32((blk._freq_min + blk._freq_max) / 2)), jnp.asarray(x))
    assert np.array_equal(np.asarray(out_exact), np.asarray(out_seq))
    assert np.array_equal(np.asarray(err_exact), np.asarray(err_seq))


def test_pll_pallas_phase_kernel_matches_oracle():
    """The phase-domain Pallas kernel (interpret mode) must track the
    float64 per-sample oracle: the detector wrap(theta - phi) is exactly
    arg(x * conj(e^{j phi})), zero samples give err = 0 (reference arg(0)
    convention), and the recorded output phases reconstruct the
    multiplied oscillator."""
    from luaradio_tpu.ops import pll as pll_mod
    from luaradio_tpu.ops.pll import pll_pallas

    alpha, beta, fmin, fmax = _bench_params()
    # interpret mode executes the unrolled loop op-by-op: keep the vector
    # and block size small (the TPU path runs the same code compiled)
    n = 512
    old_k = pll_mod._K
    pll_mod._K = 128
    cases = {
        "noise": (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
                  ).astype(np.complex64),
        "carrier": (0.7 * np.exp(1j * (2 * np.pi * 0.21 * np.arange(n)
                                       + 0.9))).astype(np.complex64),
        "zeros+carrier": np.concatenate([
            np.zeros(128, np.complex64),
            0.7 * np.exp(1j * 2 * np.pi * 0.21 * np.arange(n - 128))
            .astype(np.complex64)]),
    }
    for name, x in cases.items():
        # 2.5 exercises the fractional-multiplier branch (float-radian
        # output-oscillator side chain; integer mults advance phi_m by
        # an exact int32 multiply of the locked increment)
        for mult in (1.0, 2.5, 3.0):
            st = np.array([0.3, -0.5, (fmin + fmax) / 2], np.float32)
            xp = jnp.asarray(np.stack([x.real, x.imag]).astype(np.float32))
            out, err, ns = pll_pallas(xp, jnp.asarray(st), alpha, beta,
                                      fmin, fmax, mult, interpret=True)
            oo, oe, ost = pll_oracle(x, st, alpha, beta, fmin, fmax, mult)
            oz = np.asarray(out[0]) + 1j * np.asarray(out[1])
            assert np.max(np.abs(np.asarray(err[0]) - oe)) < 1e-3, name
            assert np.max(np.abs(oz - oo)) < 5e-2, (name, mult)
            # final state: wrapped phases + clamped frequency
            wrap = lambda p: np.angle(np.exp(1j * p))
            got = np.asarray(ns)
            assert abs(np.angle(np.exp(1j * (got[0] - ost[0])))) < 1e-3
            assert abs(got[2] - np.float32(ost[2])) < 1e-5
    pll_mod._K = old_k
