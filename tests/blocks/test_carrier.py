"""Carrier/clock recovery and level-control golden tests.

Oracles are sequential float64/float32 loops implementing the reference
per-sample semantics (pll.lua:138-167, agc.lua:72-115, powersquelch.lua:44-56,
zerocrossingclockrecovery.lua:45-75, binaryphasecorrector.lua:45-78); the
TPU blocks are parallel reformulations that must match.
"""

import numpy as np

from luaradio_tpu import (AGCBlock, BinaryPhaseCorrectorBlock, PLLBlock,
                          PowerSquelchBlock, ZeroCrossingClockRecoveryBlock)
from luaradio_tpu.types import ComplexFloat32, Float32
from tests.jig import prepare_block, run_block

RNG = np.random.default_rng(23)


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def pll_oracle(x, alpha, beta, fmin, fmax, mult):
    phi_l = phi_m = 0.0
    freq = (fmin + fmax) / 2.0
    out = np.zeros(len(x), dtype=np.complex128)
    err = np.zeros(len(x))
    two_pi = 2 * np.pi
    for i, xi in enumerate(x.astype(np.complex128)):
        vco = np.exp(1j * phi_l)
        out[i] = np.exp(1j * phi_m)
        err[i] = np.angle(xi * np.conj(vco))
        freq += beta * err[i]
        phi_l += freq + alpha * err[i]
        phi_m += freq * mult + alpha * err[i]
        freq = min(max(freq, fmin), fmax)
        if phi_l > two_pi: phi_l -= two_pi
        if phi_l < -two_pi: phi_l += two_pi
        if phi_m > two_pi: phi_m -= two_pi
        if phi_m < -two_pi: phi_m += two_pi
    return out, err


def agc_oracle(x, pa, ga, target, threshold):
    p = g = 0.0
    y = np.zeros_like(x, dtype=np.complex128)
    for i, xi in enumerate(x.astype(np.complex128)):
        p = (1 - pa) * p + pa * abs(xi) ** 2
        if p >= threshold:
            g = (1 - ga) * g + ga * (target / p)
            y[i] = np.sqrt(g) * xi
        else:
            y[i] = xi
    return y


def zccr_oracle(x, period, threshold):
    hyst = False
    off = period
    y = np.zeros(len(x), dtype=np.float32)
    for i, v in enumerate(x):
        if not hyst and v > threshold:
            hyst = True
            off = period / 2
        elif hyst and v < threshold:
            hyst = False
            off = period / 2
        off -= 1
        if off < 1:
            y[i] = 1.0
            off += period
        else:
            y[i] = -1.0
    return y


def bpc_oracle(x, num, interval):
    state = np.zeros(num)
    ma = 0.0
    idx = 0
    y = np.zeros(len(x), dtype=np.complex128)
    for i, xi in enumerate(x.astype(np.complex128)):
        if i % interval == idx:
            phi = np.angle(xi)
            if phi < -np.pi / 2: phi += np.pi
            if phi > np.pi / 2: phi -= np.pi
            last = state[0]
            state[:-1] = state[1:]
            state[-1] = phi
            ma += phi / num - last / num
        y[i] = xi * np.exp(-1j * ma)
    return y


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_pll_locks_and_matches_reference_loop():
    n = 4096
    rate = 8000.0
    f_tone = 200.0
    x = np.exp(1j * (2 * np.pi * f_tone / rate * np.arange(n) + 0.7)
               ).astype(np.complex64)
    blk = prepare_block(PLLBlock(100.0, 150.0, 250.0, multiplier=1.0),
                        [ComplexFloat32], rate=rate)
    out, err = run_block(blk, [x], splits=(700, 2048))
    exp_out, exp_err = pll_oracle(x, blk._alpha, blk._beta, blk._freq_min,
                                  blk._freq_max, 1.0)
    assert np.max(np.abs(out - exp_out)) < 2e-2
    assert np.max(np.abs(err - exp_err)) < 2e-2
    # locked: phase error decays
    assert np.mean(np.abs(err[-500:])) < 0.05


def test_pll_multiplier():
    n = 2048
    rate = 8000.0
    x = np.exp(1j * 2 * np.pi * 100.0 / rate * np.arange(n)
               ).astype(np.complex64)
    blk = prepare_block(PLLBlock(200.0, 50.0, 150.0, multiplier=3.0),
                        [ComplexFloat32], rate=rate)
    out, err = run_block(blk, [x])
    exp_out, _ = pll_oracle(x, blk._alpha, blk._beta, blk._freq_min,
                            blk._freq_max, 3.0)
    assert np.max(np.abs(out - exp_out)) < 2e-2


def test_agc():
    n = 8192
    rate = 44100.0
    x = (0.3 * (RNG.standard_normal(n) + 1j * RNG.standard_normal(n))
         ).astype(np.complex64)
    x[:n // 4] *= 1e-4  # below threshold at first
    blk = prepare_block(AGCBlock("fast"), [ComplexFloat32], rate=rate)
    y = run_block(blk, [x], splits=(1000, 5000))[0]
    exp = agc_oracle(x, blk._power_alpha, blk._gain_alpha, blk._target,
                     blk._threshold)
    assert np.max(np.abs(y - exp)) < 1e-4


def test_power_squelch():
    n = 4096
    rate = 8000.0
    x = RNG.standard_normal(n).astype(np.float32)
    x[:n // 2] *= 1e-5
    blk = prepare_block(PowerSquelchBlock(-40.0), [Float32], rate=rate)
    y = run_block(blk, [x], splits=(1000,))[0]
    # oracle
    p = 0.0
    exp = np.zeros(n, dtype=np.float64)
    a = float(blk._alpha)
    thr = float(blk._threshold)
    for i, v in enumerate(x.astype(np.float64)):
        p = (1 - a) * p + a * v * v
        exp[i] = v if p >= thr else 0.0
    assert np.max(np.abs(y - exp)) < 1e-5


def test_zero_crossing_clock_recovery():
    rate, baud = 16.0, 1.0
    bits = RNG.integers(0, 2, 64)
    x = (np.repeat(bits * 2.0 - 1.0, int(rate / baud))
         + 0.05 * RNG.standard_normal(64 * 16)).astype(np.float32)
    blk = prepare_block(ZeroCrossingClockRecoveryBlock(baud), [Float32],
                        rate=rate)
    y = run_block(blk, [x], splits=(100, 500))[0]
    exp = zccr_oracle(x, rate / baud, 0.0)
    assert np.array_equal(y, exp)


def test_binary_phase_corrector():
    n = 4096
    phase = 0.4
    bits = RNG.integers(0, 2, n) * 2 - 1
    x = (bits * np.exp(1j * phase)).astype(np.complex64)
    blk = prepare_block(BinaryPhaseCorrectorBlock(32, sample_interval=32),
                        [ComplexFloat32])
    y = run_block(blk, [x], splits=(1024,))[0]
    exp = bpc_oracle(x, 32, 32)
    assert np.max(np.abs(y - exp)) < 1e-4
    # steady state: phase removed
    assert np.max(np.abs(np.angle(y[-100:] * bits[-100:]))) < 1e-3


def test_pll_linear_fast_path_matches_sequential_in_lock():
    """The parallel-in-time linear PLL (ops/pll_linear.py) must reproduce
    the sequential loop exactly (to float32 rounding) once locked, report
    valid=True, and hand its state across chunk boundaries."""
    import jax.numpy as jnp
    from luaradio_tpu.ops.pll_linear import pll_linear

    rate, f_tone = 8000.0, 200.0
    n = 8192
    blk = prepare_block(PLLBlock(100.0, 150.0, 250.0, multiplier=1.0),
                        [ComplexFloat32], rate=rate)
    a, b = blk._alpha, blk._beta
    fmin, fmax = blk._freq_min, blk._freq_max
    # one phase-continuous tone; the first 4096 samples are the lock-in
    # preamble, the rest is the chunk under test
    full = np.exp(1j * 2 * np.pi * f_tone / rate * np.arange(4096 + n)
                  ).astype(np.complex64)
    full += (0.01 * (RNG.standard_normal(4096 + n)
                     + 1j * RNG.standard_normal(4096 + n))
             ).astype(np.complex64)
    pre, x = full[:4096], full[4096:]
    exp_out, exp_err = pll_oracle(full, a, b, fmin, fmax, 1.0)
    # oracle state entering x: recompute phases from its last outputs
    # (run the oracle loop manually to capture state)
    phi_l = phi_m = 0.0
    freq = (fmin + fmax) / 2.0
    for xi in pre.astype(np.complex128):
        e = np.angle(xi * np.exp(-1j * phi_l))
        freq += b * e
        phi_l += freq + a * e
        phi_m += freq * 1.0 + a * e
        freq = min(max(freq, fmin), fmax)
    st = (jnp.float32(phi_l % (2 * np.pi)), jnp.float32(phi_m % (2 * np.pi)),
          jnp.float32(freq))

    # two linear chunks with state handoff
    outs, errs = [], []
    for lo, hi in ((0, n // 2), (n // 2, n)):
        valid, st, out, err = pll_linear(jnp.asarray(x[lo:hi]), st,
                                         a, b, fmin, fmax, 1)
        assert bool(valid)
        outs.append(np.asarray(out))
        errs.append(np.asarray(err))
    got_out = np.concatenate(outs)
    got_err = np.concatenate(errs)
    assert np.max(np.abs(got_out - exp_out[4096:])) < 2e-3
    assert np.max(np.abs(got_err - exp_err[4096:])) < 2e-3


def test_pll_linear_guards_reject_acquisition():
    """From a cold far-off state the guards must flag the linear solution
    invalid (the hybrid then falls back to the sequential kernel)."""
    import jax.numpy as jnp
    from luaradio_tpu.ops.pll_linear import pll_linear

    rate = 8000.0
    n = 2048
    blk = prepare_block(PLLBlock(20.0, 900.0, 1100.0, multiplier=1.0),
                        [ComplexFloat32], rate=rate)
    # tone far outside [fmin, fmax]: the loop rails the clamp
    x = np.exp(1j * 2 * np.pi * 100.0 / rate * np.arange(n)
               ).astype(np.complex64)
    valid, _, _, _ = pll_linear(jnp.asarray(x), blk.init_state(),
                                blk._alpha, blk._beta,
                                blk._freq_min, blk._freq_max, 1)
    assert not bool(valid)
