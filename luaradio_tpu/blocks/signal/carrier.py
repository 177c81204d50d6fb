"""Carrier/clock recovery and level-control blocks.

TPU-native equivalents of /root/reference/radio/blocks/signal/{pll,agc,
powersquelch,zerocrossingclockrecovery,binaryphasecorrector}.lua.

The reference implements all of these as per-sample sequential loops.  Here
everything except the PLL is reformulated as *parallel* computations:

* AGC / PowerSquelch — the 1-pole power and gain recurrences are first-order
  linear recurrences (with data-dependent coefficients for the AGC's gain
  hold-below-threshold), solved with associative scans.
* ZeroCrossingClockRecovery — the NCO countdown between input zero crossings
  is solved in closed form per sample from the distance to the most recent
  crossing (a cumulative max), eliminating the sequential countdown loop.
* BinaryPhaseCorrector — the moving-average phase estimate is a windowed mean
  over the decimated sample-point sequence (cumsum difference) and is gathered
  back per sample.
* PLL — a true nonlinear feedback loop; implemented exactly as a lax.scan
  (bit-faithful to the reference loop filter, pll.lua:138-167).  For pilot
  tone recovery at scale, composites use the vectorized pilot path instead.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from luaradio_tpu.core.block import Input, Output, SignalBlock
from luaradio_tpu.ops.scan import linrec_first_order
from luaradio_tpu.types import ComplexFloat32, Float32


class PLLBlock(SignalBlock):
    """Phase-locked loop tracking a complex tone; emits the locked (optionally
    frequency-multiplied) oscillator and the phase error.

    Exact port of the reference's second-order loop-filter semantics
    (pll.lua:138-167): err = arg(x * conj(vco)); freq += beta*err;
    phi += freq + alpha*err (pre-clamp freq used); freq clamped to
    [freq_min, freq_max]; phases wrapped at +-2pi.
    """

    def __init__(self, loop_bandwidth: float, frequency_min: float,
                 frequency_max: float, multiplier: float = 1.0,
                 exact: bool = False):
        """``exact=True`` disables the overlap-and-discard acquisition tier
        (whose accepted outputs are approximate within fixed warm-up
        tolerances — see docs/parity-deviations.md): non-locked chunks then
        always run the bit-exact sequential kernel."""
        super().__init__()
        self.loop_bandwidth = loop_bandwidth
        self.frequency_min = frequency_min
        self.frequency_max = frequency_max
        self.multiplier = multiplier
        self.exact = bool(exact)
        self.add_type_signature(
            [Input("in", ComplexFloat32)],
            [Output("out", ComplexFloat32), Output("error", Float32)])

    def initialize(self):
        rate = self.get_rate()
        damping = np.sqrt(2.0) / 2.0
        loop_bw = 2 * np.pi * (self.loop_bandwidth / rate)
        loop_bw = loop_bw / (damping + 1.0 / (4 * damping))
        denom = 1 + 2 * damping * loop_bw + loop_bw * loop_bw
        self._alpha = np.float32(4 * damping * loop_bw / denom)
        self._beta = np.float32(4 * loop_bw * loop_bw / denom)
        self._freq_min = np.float32(2 * np.pi * self.frequency_min / rate)
        self._freq_max = np.float32(2 * np.pi * self.frequency_max / rate)

    def init_state(self):
        freq0 = (self._freq_min + self._freq_max) / 2.0
        return (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(freq0))

    def process(self, state, x):
        alpha, beta = self._alpha, self._beta
        fmin, fmax = self._freq_min, self._freq_max
        mult = np.float32(self.multiplier)
        two_pi = np.float32(2 * np.pi)

        def sequential(state, x):
            # Unbatched streams on TPU use the Pallas kernel (ops/pll.py):
            # the whole feedback loop runs on-core, state in registers.
            if x.ndim == 1 and jax.default_backend() != "cpu":
                from luaradio_tpu.ops.pll import pll_pallas
                phi_l, phi_m, freq = state
                st = jnp.stack([jnp.asarray(phi_l, jnp.float32),
                                jnp.asarray(phi_m, jnp.float32),
                                jnp.asarray(freq, jnp.float32)])
                xp = jnp.stack([jnp.real(x), jnp.imag(x)])
                out_pair, err, st2 = pll_pallas(xp, st, alpha, beta,
                                                fmin, fmax, mult,
                                                interpret=False)
                out = lax.complex(out_pair[0], out_pair[1])
                return (st2[0], st2[1], st2[2]), (out, err[0])
            return self._scan(state, x)

        # Integer multipliers take the parallel-in-time linear fast path
        # (ops/pll_linear.py) with the sequential kernel as the lax.cond
        # fallback for unlocked / clamp-railing chunks.
        if x.ndim == 1 and float(self.multiplier).is_integer() \
                and self.multiplier >= 1:
            from luaradio_tpu.ops.pll_linear import pll_hybrid
            return pll_hybrid(x, state, alpha, beta, fmin, fmax,
                              int(self.multiplier), sequential,
                              allow_overlap=not self.exact)
        return sequential(state, x)

    def _scan(self, state, x):
        alpha, beta = self._alpha, self._beta
        fmin, fmax = self._freq_min, self._freq_max
        mult = np.float32(self.multiplier)
        two_pi = np.float32(2 * np.pi)

        def step(carry, xi):
            phi_l, phi_m, freq = carry
            vco = jnp.exp(1j * phi_l)
            out = jnp.exp(1j * phi_m).astype(jnp.complex64)
            pd = xi * jnp.conj(vco)
            err = jnp.arctan2(pd.imag, pd.real)
            freq = freq + beta * err
            phi_l = phi_l + freq + alpha * err
            phi_m = phi_m + freq * mult + alpha * err
            freq = jnp.clip(freq, fmin, fmax)
            phi_l = jnp.where(phi_l > two_pi, phi_l - two_pi, phi_l)
            phi_l = jnp.where(phi_l < -two_pi, phi_l + two_pi, phi_l)
            phi_m = jnp.where(phi_m > two_pi, phi_m - two_pi, phi_m)
            phi_m = jnp.where(phi_m < -two_pi, phi_m + two_pi, phi_m)
            return (phi_l, phi_m, freq), (out, err)

        state, (out, err) = lax.scan(step, state, x, unroll=8)
        return state, (out, err)


class PilotRecoveryBlock(SignalBlock):
    """Vectorized pilot-tone carrier recovery: complex bandpass FIR around
    the pilot, magnitude normalization (the instantaneous-phase estimator),
    and integer phase multiplication — out = (bp(x)/|bp(x)|)^multiplier.

    The TPU-native alternative to ComplexBandpassFilterBlock -> PLLBlock
    for pilot-locked receivers (WBFM stereo 19 kHz -> 38 kHz, RDS 19 kHz ->
    57 kHz): the PLL is a per-sample feedback loop (the reference's slowest
    kernel, pll.lua:138-167 / BASELINE.md 5.5 MS/s); this path is pure
    FIR + elementwise, so it runs at HBM speed AND time-shards across a
    mesh (parallel/time.py pilot_recovery_sharded).  Equivalent to the PLL
    within SNR tolerances when the pilot is present: the bandpass sets the
    noise bandwidth where the PLL's loop filter would.

    No reference analog (the reference has only the PLL,
    /root/reference/radio/composites/wbfmstereodemodulator.lua:40-42).
    """

    def __init__(self, num_taps: int, band: tuple, multiplier: int = 1,
                 nyquist: float | None = None, window: str = "hamming"):
        super().__init__()
        if num_taps % 2 == 0:
            raise ValueError("PilotRecoveryBlock requires odd num_taps")
        self.num_taps = int(num_taps)
        self.band = tuple(band)
        self.multiplier = int(multiplier)
        self.nyquist = nyquist
        self.window = window
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", ComplexFloat32)])

    def initialize(self):
        from luaradio_tpu.utils import filter_design
        nyq = self.nyquist or (self.get_rate() / 2.0)
        self._taps = filter_design.firwin_complex_bandpass(
            self.num_taps, (self.band[0] / nyq, self.band[1] / nyq),
            self.window).astype(np.complex64)

    def init_state(self):
        from luaradio_tpu.ops.fir import fir_init_state
        return fir_init_state(self.num_taps, jnp.complex64)

    def process(self, state, x):
        from luaradio_tpu.ops.complexutil import const_complex
        from luaradio_tpu.ops.fir import fir_direct
        p, state = fir_direct(x, const_complex(self._taps), state)
        y = pilot_normalize_multiply(p, self.multiplier)
        return state, y


def pilot_normalize_multiply(p: jnp.ndarray, multiplier: int) -> jnp.ndarray:
    """(p/|p|)^multiplier, elementwise, safe at p == 0."""
    mag = jnp.abs(p)
    u = p / jnp.maximum(mag, np.float32(1e-20)).astype(p.real.dtype)
    u = jnp.where(mag > 0, u, jnp.ones_like(u))
    y = u
    for _ in range(int(multiplier) - 1):
        y = y * u
    return y.astype(jnp.complex64)


class AGCBlock(SignalBlock):
    """Feed-forward AGC: 1-pole power estimate, 1-pole gain filter toward
    target/power (held below threshold), sqrt-gain applied
    (reference: agc.lua:72-115).  Fully parallel via associative scans."""

    def __init__(self, mode: str, target: float = -35.0,
                 threshold: float = -75.0, gain_tau: float | None = None,
                 power_tau: float = 1.0):
        super().__init__()
        if mode not in ("fast", "slow", "custom"):
            raise ValueError(f"invalid mode {mode!r}")
        self.mode = mode
        self.target_db = target
        self.threshold_db = threshold
        self.gain_tau = {"fast": 0.1, "slow": 3.0}.get(mode, gain_tau)
        if self.gain_tau is None:
            raise ValueError("custom mode requires gain_tau")
        self.power_tau = power_tau
        for t in (Float32, ComplexFloat32):
            self.add_type_signature([Input("in", t)], [Output("out", t)])

    def initialize(self):
        rate = self.get_rate()
        self._power_alpha = np.float32(1.0 / (1.0 + self.power_tau * rate))
        self._gain_alpha = np.float32(1.0 / (1.0 + self.gain_tau * rate))
        self._target = np.float32(10 ** (self.target_db / 10))
        self._threshold = np.float32(10 ** (self.threshold_db / 10))

    def init_state(self):
        return (jnp.float32(0.0), jnp.float32(0.0))  # (avg power, gain)

    def process(self, state, x):
        p0, g0 = state
        ap, ag = self._power_alpha, self._gain_alpha
        power_in = jnp.abs(x).astype(jnp.float32) ** 2
        p = linrec_first_order(ap * power_in, np.float32(1.0) - ap, p0)
        active = p >= self._threshold
        a = jnp.where(active, np.float32(1.0) - ag, np.float32(1.0))
        u = jnp.where(active,
                      ag * self._target / jnp.maximum(p, np.float32(1e-30)),
                      np.float32(0.0))
        g = linrec_first_order(u, a, g0)
        gain = jnp.sqrt(g).astype(x.real.dtype)
        y = jnp.where(active, gain * x, x)
        return (p[..., -1], g[..., -1]), y

    def process_sharded(self, state, x, *, axis_name: str):
        # both 1-pole recurrences become distributed prefix scans; the
        # gain recurrence's data-dependent decay (hold below threshold)
        # passes through the same affine-pair combine
        from luaradio_tpu.parallel.time import linrec_first_order_sharded
        p0, g0 = state
        ap, ag = self._power_alpha, self._gain_alpha
        power_in = jnp.abs(x).astype(jnp.float32) ** 2
        p, p_final = linrec_first_order_sharded(
            ap * power_in, np.float32(1.0) - ap, p0, axis_name,
            with_final=True)
        active = p >= self._threshold
        a = jnp.where(active, np.float32(1.0) - ag, np.float32(1.0))
        u = jnp.where(active,
                      ag * self._target / jnp.maximum(p, np.float32(1e-30)),
                      np.float32(0.0))
        g, g_final = linrec_first_order_sharded(u, a, g0, axis_name,
                                                with_final=True)
        gain = jnp.sqrt(g).astype(x.real.dtype)
        y = jnp.where(active, gain * x, x)
        # final states from the scans' own gathered summaries (replicated;
        # they are re-read as y0 on every shard next chunk)
        return (p_final, g_final), y


class PowerSquelchBlock(SignalBlock):
    """Zero the output while the 1-pole average power is below a threshold
    (reference: powersquelch.lua)."""

    def __init__(self, threshold: float, tau: float = 0.001):
        super().__init__()
        self.threshold_db = threshold
        self.tau = tau
        for t in (Float32, ComplexFloat32):
            self.add_type_signature([Input("in", t)], [Output("out", t)])

    def initialize(self):
        self._alpha = np.float32(1.0 / (1.0 + self.tau * self.get_rate()))
        self._threshold = np.float32(10 ** (self.threshold_db / 10))

    def init_state(self):
        return jnp.float32(0.0)

    def process(self, state, x):
        a = self._alpha
        power_in = jnp.abs(x).astype(jnp.float32) ** 2
        p = linrec_first_order(a * power_in, np.float32(1.0) - a, state)
        y = jnp.where(p >= self._threshold, x, jnp.zeros_like(x))
        return p[..., -1], y

    def process_sharded(self, state, x, *, axis_name: str):
        from luaradio_tpu.parallel.time import linrec_first_order_sharded
        a = self._alpha
        power_in = jnp.abs(x).astype(jnp.float32) ** 2
        p, p_final = linrec_first_order_sharded(
            a * power_in, np.float32(1.0) - a, state, axis_name,
            with_final=True)
        y = jnp.where(p >= self._threshold, x, jnp.zeros_like(x))
        return p_final, y


class ZeroCrossingClockRecoveryBlock(SignalBlock):
    """Emit a +1/-1 clock aligned to half a symbol period after each input
    zero crossing (reference: zerocrossingclockrecovery.lua).

    The reference counts an NCO down per sample; here the pulse positions are
    solved in closed form: with d the distance since the most recent crossing
    (a cummax) the cumulative pulse count is ceil((d + 1 - P/2)/P), and a
    pulse fires wherever that count increments.
    """

    def __init__(self, baudrate: float, threshold: float = 0.0):
        super().__init__()
        self.baudrate = baudrate
        self.threshold = threshold
        self.add_type_signature([Input("in", Float32)], [Output("out", Float32)])

    def initialize(self):
        self._period = np.float32(self.get_rate() / self.baudrate)

    def init_state(self):
        # (hysteresis in {0,1}, offset value entering the chunk)
        return (jnp.float32(-1.0), jnp.float32(self._period))

    def _pulse_count(self, decs, base):
        """Pulses after `decs` decrements starting from offset `base`."""
        p = self._period
        return jnp.maximum(jnp.ceil((decs + np.float32(1.0) - base) / p),
                           np.float32(0.0))

    def process(self, state, x):
        h0, off0 = state
        thr = np.float32(self.threshold)
        p = self._period
        n = x.shape[-1]

        # Hysteresis state: +1 above threshold, -1 below, hold on equality.
        raw = jnp.where(x > thr, 1.0, jnp.where(x < thr, -1.0, 0.0)
                        ).astype(jnp.float32)
        hold = raw == 0.0
        s = linrec_first_order(raw, jnp.where(hold, 1.0, 0.0).astype(jnp.float32),
                               h0)
        s_prev = jnp.concatenate([jnp.broadcast_to(h0, s[..., :1].shape),
                                  s[..., :-1]], axis=-1)
        cross = (s != s_prev) & ~hold

        # Most recent crossing index (or -1): cumulative max.
        from luaradio_tpu.ops.scan import cummax_blocked
        idx = jnp.arange(n, dtype=jnp.float32)
        c = cummax_blocked(jnp.where(cross, idx, -1.0))
        has = c >= 0.0

        k = idx - c + 1.0                       # decrements since crossing
        m_cross = self._pulse_count(k, p / 2.0)
        m_free = self._pulse_count(idx + 1.0, off0)
        m = jnp.where(has, m_cross, m_free)
        m_prev = jnp.concatenate(
            [jnp.zeros_like(m[..., :1]), m[..., :-1]], axis=-1)
        m_prev = jnp.where(cross, 0.0, m_prev)
        pulse = m > m_prev
        y = jnp.where(pulse, 1.0, -1.0).astype(jnp.float32)

        off_end = jnp.where(
            has[..., -1],
            p / 2.0 - k[..., -1] + m[..., -1] * p,
            off0 - np.float32(n) + m[..., -1] * p)
        return (s[..., -1], off_end), y

    def process_sharded(self, state, x, *, axis_name: str):
        """Time-sharded form: the hysteresis recurrence distributes as an
        affine prefix scan, the most-recent-crossing index as a
        distributed cummax over GLOBAL sample indices, and the pulse-count
        chain needs only a 1-sample neighbor halo."""
        from luaradio_tpu.parallel.time import (cummax_sharded, left_halo,
                                                linrec_first_order_sharded)
        h0, off0 = state
        thr = np.float32(self.threshold)
        p = self._period
        n_local = x.shape[-1]
        d = lax.axis_size(axis_name)
        sh = lax.axis_index(axis_name)
        n_global = np.float32(n_local * d)

        raw = jnp.where(x > thr, 1.0, jnp.where(x < thr, -1.0, 0.0)
                        ).astype(jnp.float32)
        hold = raw == 0.0
        # global final hysteresis state comes from the scan's own gathered
        # summaries (replicated, zero extra collectives)
        s, s_final = linrec_first_order_sharded(
            raw, jnp.where(hold, 1.0, 0.0).astype(jnp.float32), h0,
            axis_name, with_final=True)
        s_halo = left_halo(s, 1, axis_name)[..., 0]
        # [..., None] forms keep banked leading axes broadcastable: under a
        # combined (channel, time) mesh the state is [C] while s is [C, T]
        s_prev = jnp.concatenate(
            [jnp.where(sh == 0,
                       jnp.broadcast_to(jnp.asarray(h0)[..., None],
                                        s[..., :1].shape),
                       s_halo[..., None]), s[..., :-1]], axis=-1)
        cross = (s != s_prev) & ~hold

        # global sample indices on this shard
        idx = (jnp.arange(n_local, dtype=jnp.float32)
               + sh.astype(jnp.float32) * np.float32(n_local))
        c = cummax_sharded(jnp.where(cross, idx, -1.0), axis_name)
        has = c >= 0.0

        k = idx - c + 1.0
        m_cross = self._pulse_count(k, p / 2.0)
        m_free = self._pulse_count(
            idx + 1.0, jnp.asarray(off0, jnp.float32)[..., None])
        m_free = jnp.broadcast_to(m_free, m_cross.shape)
        m = jnp.where(has, m_cross, m_free)
        m_halo = left_halo(m, 1, axis_name)[..., 0]
        m_prev = jnp.concatenate(
            [jnp.where(sh == 0, jnp.zeros_like(m[..., :1]),
                       m_halo[..., None]), m[..., :-1]], axis=-1)
        m_prev = jnp.where(cross, 0.0, m_prev)
        pulse = m > m_prev
        y = jnp.where(pulse, 1.0, -1.0).astype(jnp.float32)

        # off_end is read on every shard next chunk (m_free), so it must be
        # replicated — ONE batched all_gather of the three last-sample
        # scalars (k, m, has) instead of one collective each
        lasts = jnp.stack([k[..., -1], m[..., -1],
                           has[..., -1].astype(jnp.float32)], axis=-1)
        gl = lax.all_gather(lasts, axis_name)[-1]
        k_l, m_l, has_l = gl[..., 0], gl[..., 1], gl[..., 2] > 0
        off_end = jnp.where(
            has_l,
            p / 2.0 - k_l + m_l * p,
            off0 - n_global + m_l * p)
        return (s_final, off_end), y


class BinaryPhaseCorrectorBlock(SignalBlock):
    """Rotate out the moving-average BPSK phase offset, estimated from every
    sample_interval-th sample with angles folded into [-pi/2, pi/2]
    (reference: binaryphasecorrector.lua)."""

    def __init__(self, num_samples: int, sample_interval: int = 32):
        super().__init__()
        self.num_samples = int(num_samples)
        self.sample_interval = int(sample_interval)
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", ComplexFloat32)])

    def chunk_multiple(self):
        return self.sample_interval

    def init_state(self):
        return jnp.zeros((self.num_samples,), dtype=jnp.float32)

    def process(self, state, x):
        interval = self.sample_interval
        num = self.num_samples
        n = x.shape[-1]
        pts = x[..., ::interval]
        phi = jnp.angle(pts)
        half_pi = np.float32(np.pi / 2)
        pi = np.float32(np.pi)
        phi = jnp.where(phi < -half_pi, phi + pi, phi)
        phi = jnp.where(phi > half_pi, phi - pi, phi)
        seq = jnp.concatenate([state, phi], axis=-1)
        # ma[j] = mean(seq[j+1 .. j+num]) — the window of `num` phis ending at
        # (and including) sample point j.
        k = phi.shape[-1]
        csum = jnp.cumsum(seq, axis=-1)
        prev = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
        ma_pts = (csum[..., num:num + k] - prev[..., 1:k + 1]) / np.float32(num)
        ma = jnp.repeat(ma_pts, interval, axis=-1)[..., :n]
        y = x * jnp.exp(-1j * ma)
        return seq[..., -num:], y.astype(jnp.complex64)

    def process_sharded(self, state, x, *, axis_name: str):
        """Time-sharded form: the moving-average window over sample-point
        phases becomes a distributed cumulative sum minus its num-point
        delayed self; ma[j] = (CS[j+num+1] - CS[j+1]) / num over the
        virtual sequence state ++ phis, with the carried-state prefix
        entering shard 0 as the delay halo."""
        from luaradio_tpu.parallel.time import (cumsum_sharded, delay_sharded,
                                                ring_halo, shard0_state)
        interval = self.sample_interval
        num = self.num_samples
        n = x.shape[-1]
        pts = x[..., ::interval]
        if num > pts.shape[-1]:
            raise NotImplementedError(
                f"{self.name}: averaging window ({num} points) exceeds the "
                f"per-shard sample points ({pts.shape[-1]}); increase "
                f"chunk_size")
        phi = jnp.angle(pts)
        half_pi = np.float32(np.pi / 2)
        pi = np.float32(np.pi)
        phi = jnp.where(phi < -half_pi, phi + pi, phi)
        phi = jnp.where(phi > half_pi, phi - pi, phi)

        gcs = cumsum_sharded(phi, axis_name)           # global inclusive
        st_cs = jnp.cumsum(state, axis=-1)             # carried prefix
        s_total = st_cs[..., -1]
        carry = st_cs - s_total[..., None]             # CS[j+1] - S_total
        delayed = delay_sharded(gcs, num, axis_name, carry=carry)
        ma_pts = (gcs - delayed) / np.float32(num)
        ma = jnp.repeat(ma_pts, interval, axis=-1)[..., :n]
        y = x * jnp.exp(-1j * ma)
        # the carried phi window is read on shard 0 only (the delay
        # carry): a circular ppermute lands the global tail there —
        # point-to-point instead of an all_gather of num*D phases
        new_state = shard0_state(ring_halo(phi, num, axis_name), axis_name)
        return new_state, y.astype(jnp.complex64)


__all__ = [
    "PLLBlock", "PilotRecoveryBlock", "AGCBlock", "PowerSquelchBlock",
    "ZeroCrossingClockRecoveryBlock", "BinaryPhaseCorrectorBlock",
]

# PilotRecoveryBlock's state is a pure FIR input tail — generic halo
# exchange (SignalBlock.process_sharded) is exact for it.  The PLL keeps
# the default (its per-sample feedback cannot time-shard; use
# PilotRecoveryBlock or channel banking — parallel/time.py has the
# linear-path pll_linear_sharded for callers that manage acquisition).
PilotRecoveryBlock.tail_state = True
