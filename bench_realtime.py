"""Real-time streaming artifact (VERDICT r3 item 8): a fake rtlsdr driver
pacing u8 IQ at 2.4 MS/s in WALL-CLOCK time drives the full rx_wbfm chain
into an audio-rate-paced sink stub for >= 30 s, proving sustained
real-time operation — the reference's flagship live-SDR use
(rtlsdr.lua:214-266, throttle.lua:30-110) — with measured:

* sustained input throughput vs the 2.4 MS/s radio rate,
* steady-state ring overflow count (MUST be 0: every USB buffer kept up),
* end-to-end latency (production time of a sample at the fake USB
  boundary -> its demodulated audio leaving the sink), and its slope
  (a backlogged chain shows linearly growing latency; flat = real time),
* real-time margin: the same chain's unpaced throughput / radio rate.

Run as a script for the 30 s artifact (REALTIME_r{N}.json, real TPU);
tests/core/test_realtime.py runs a shortened version in CI (CPU).
"""

from __future__ import annotations

import ctypes
import json
import os
import threading
import time
from ctypes import POINTER, c_int, c_void_p, cast

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

RATE = 2.4e6
IF_RATE = 240e3          # tuner decimation 10
AF_RATE = 48e3           # mono audio, downsample 5
CHUNK = 1 << 19          # ~0.22 s of RF per chunk


class PacedFakeRtlSdr:
    """Fake librtlsdr ABI delivering u8 IQ at exactly ``rate`` samples/s
    of wall-clock time (a real dongle's USB stream), for ``duration``
    seconds, then EOF.  The payload is an FM-modulated 1 kHz tone."""

    def __init__(self, rate: float = RATE, duration: float = 30.0):
        self.rate = rate
        self.duration = duration
        self.t0: float | None = None
        self.produced = 0            # complex samples delivered
        n = 1 << 20                  # recycled modulated block
        t = np.arange(n) / rate
        audio = np.sin(2 * np.pi * 1e3 * t)
        phi = 2 * np.pi * 75e3 * np.cumsum(audio) / rate
        iq = np.exp(1j * phi)
        u8 = np.empty(2 * n, np.uint8)
        u8[0::2] = np.round(iq.real * 127.5 + 127.5).clip(0, 255)
        u8[1::2] = np.round(iq.imag * 127.5 + 127.5).clip(0, 255)
        self.block = u8
        self.calls = []

    def __getattr__(self, name):
        if not name.startswith("rtlsdr_"):
            raise AttributeError(name)
        short = name[len("rtlsdr_"):]
        if short == "open":
            def open_(devp, idx):
                cast(devp, POINTER(c_void_p))[0] = c_void_p(0x171)
                return 0
            return open_
        if short == "read_sync":
            return self._read_sync

        def record(*args):
            self.calls.append((short, args))
            return 0
        return record

    def _read_sync(self, dev, buf, nbytes, gotp):
        n_bytes = nbytes if isinstance(nbytes, int) else nbytes.value
        n = n_bytes // 2
        if self.t0 is None:
            self.t0 = time.monotonic()
        # pace: the LAST byte of this buffer exists only at its real-time
        # production instant
        target = self.t0 + (self.produced + n) / self.rate
        delay = target - time.monotonic()
        if delay > 0:
            time.sleep(delay)
        if self.produced / self.rate >= self.duration:
            return -1                # stream end
        off = (self.produced * 2) % len(self.block)
        seg = np.concatenate([self.block[off:off + 2 * n],
                              self.block[:max(0, 2 * n - (len(self.block)
                                                          - off))]])[:2 * n]
        ctypes.memmove(buf, seg.ctypes.data, len(seg))
        cast(gotp, POINTER(c_int))[0] = len(seg)
        self.produced += n
        return 0


def _build(fake, sink):
    import luaradio_tpu as lr
    from luaradio_tpu.blocks.sources.sdr import RtlSdrSource

    RtlSdrSource._injected_lib = fake
    src = RtlSdrSource(104.3e6, RATE)
    top = lr.CompositeBlock()
    top.connect(src,
                lr.TunerBlock(0.0, 100e3, int(RATE / IF_RATE)),
                lr.WBFMMonoDemodulator(),
                lr.DownsamplerBlock(int(IF_RATE / AF_RATE)),
                sink)
    return top, src


def run_realtime(duration: float = 30.0, grace: float = 2.0,
                 chunk: int = CHUNK):
    """Returns the artifact dict; the chain must hold 2.4 MS/s live."""
    import luaradio_tpu as lr
    from luaradio_tpu.core.block import Input
    from luaradio_tpu.core.runtime import Runner

    class AudioStubSink(lr.SinkBlock):
        """Audio-sink stand-in: paces consumption at the audio rate with
        an absolute schedule (what PulseAudio's buffer does) and records
        end-to-end latency of the newest sample of every chunk."""

        def __init__(self, fake):
            super().__init__()
            self.fake = fake
            self.consumed = 0
            self.records = []        # (wall time, latency seconds)
            self._t0 = None
            self.add_type_signature([Input("in", lambda t: True)], [])

        def process(self, x):
            n = len(x)
            now = time.monotonic()
            if self._t0 is None:
                self._t0 = now
            self.consumed += n
            target = self._t0 + self.consumed / AF_RATE
            delay = target - now
            if delay > 0:
                time.sleep(delay)
            if self.fake.t0 is not None:
                rf_consumed = self.consumed * (RATE / AF_RATE)
                produced_at = self.fake.t0 + rf_consumed / RATE
                self.records.append((time.monotonic(),
                                     time.monotonic() - produced_at))

    # --- warm the compile cache with an unpaced short run ----------------
    warm_fake = PacedFakeRtlSdr(duration=0.0)
    warm_fake.t0 = time.monotonic() - 1e9        # everything "late": no sleep
    warm_fake.duration = 1e12
    warm_fake.produced = 0
    sink = AudioStubSink(warm_fake)
    top, src = _build(warm_fake, sink)
    r = Runner(top, mode="fused", chunk_size=chunk)
    t_compile0 = time.monotonic()
    r.run(max_chunks=3)
    warmup_s = time.monotonic() - t_compile0

    # --- unpaced max-throughput (real-time margin); non-pacing sink ------
    burst_fake = PacedFakeRtlSdr(duration=1e12)
    burst_fake.t0 = time.monotonic() - 1e9
    top, src = _build(burst_fake, lr.NopSink())
    r = Runner(top, mode="fused", chunk_size=chunk)
    t0 = time.monotonic()
    r.run(max_chunks=8)
    for seg, _ in r.stage_plan:
        if seg is not None:
            seg.drain()
    burst_sps = 8 * chunk / (time.monotonic() - t0)
    r._cleanup_once()

    # --- the paced real-time run -----------------------------------------
    fake = PacedFakeRtlSdr(duration=duration)
    sink = AudioStubSink(fake)
    top, src = _build(fake, sink)
    r = Runner(top, mode="fused", chunk_size=chunk)
    ov_mark = {}

    def snapshot_overflows(after: float):
        time.sleep(after)
        ov_mark["post_grace"] = src.ring.overflows if src.ring else 0
    g = threading.Thread(target=snapshot_overflows, args=(grace,),
                         daemon=True)
    t_start = time.monotonic()
    g.start()
    r.run()
    elapsed = time.monotonic() - t_start
    g.join(timeout=1.0)

    lat = [(t, l) for (t, l) in sink.records
           if t - t_start > grace]
    lats = np.array([l for _, l in lat]) if lat else np.zeros(1)
    ts = np.array([t for t, _ in lat]) if lat else np.zeros(1)
    slope = (np.polyfit(ts - ts[0], lats, 1)[0]
             if len(lat) >= 3 else 0.0)
    overflows_total = src.ring.overflows if src.ring else 0
    steady_overflows = overflows_total - ov_mark.get("post_grace", 0)

    return {
        "radio_rate_sps": RATE,
        "duration_s": round(elapsed, 2),
        "chunk_rf_samples": chunk,
        "delivered_rf_samples": fake.produced,
        "sustained_input_sps": round(fake.produced / elapsed, 1),
        "audio_samples_out": sink.consumed,
        "ring_overflows_steady_state": int(steady_overflows),
        "ring_overflows_startup": int(ov_mark.get("post_grace", 0)),
        "latency_p50_s": round(float(np.median(lats)), 4),
        "latency_max_s": round(float(np.max(lats)), 4),
        "latency_slope_s_per_s": round(float(slope), 5),
        "unpaced_throughput_sps": round(burst_sps, 1),
        "real_time_margin": round(burst_sps / RATE, 2),
        "compile_warmup_s": round(warmup_s, 1),
        "grace_s": grace,
        "ok": bool(steady_overflows == 0 and abs(slope) < 0.05
                   and burst_sps > RATE),
    }


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    rec = run_realtime(duration=30.0)
    print(json.dumps(rec, indent=1))
    tag = os.environ.get("LUARADIO_TPU_ROUND", "r04")
    with open(os.path.join(REPO, f"REALTIME_{tag}.json"), "w") as f:
        json.dump(rec, f, indent=1)
