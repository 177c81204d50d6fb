"""SDR driver bindings, unit-tested against fake ctypes libraries.

The reference ships its SDR drivers untested (no hardware in CI —
/root/reference/tests has no rtlsdr/airspy/... specs); here every driver's
initialize/stream/convert/cleanup path runs against an in-process fake
exposing the vendor C ABI, including real ctypes callback marshaling for
the async drivers and the ring-buffer ingest shared by all of them."""

import ctypes
import threading
import time
from ctypes import POINTER, byref, c_int, c_uint8, c_void_p, cast

import numpy as np
import pytest

from luaradio_tpu.utils.ringbuffer import SampleRingBuffer

RNG = np.random.default_rng(21)


# ---------------------------------------------------------------------------
# ring buffer
# ---------------------------------------------------------------------------

def test_ringbuffer_basic():
    rb = SampleRingBuffer(1024, np.complex64)
    x = (RNG.standard_normal(300) + 1j * RNG.standard_normal(300)
         ).astype(np.complex64)
    assert rb.write(x)
    got = rb.read(200)
    np.testing.assert_array_equal(got, x[:200])
    got = rb.read(200)
    np.testing.assert_array_equal(got, x[200:])


def test_ringbuffer_wraparound_and_overflow():
    rb = SampleRingBuffer(256, np.complex64)
    a = np.arange(200, dtype=np.complex64)
    assert rb.write(a)
    rb.read(150)
    b = np.arange(200, dtype=np.complex64) + 1000
    assert rb.write(b)  # wraps
    assert not rb.write(np.zeros(100, np.complex64))  # would overflow
    assert rb.overflows == 1 and rb.dropped_samples == 100
    got = rb.read(250)
    np.testing.assert_array_equal(got, np.concatenate([a[150:], b]))


def test_ringbuffer_blocking_and_close():
    rb = SampleRingBuffer(64, np.complex64)
    out = []

    def consumer():
        while True:
            c = rb.read(16, timeout=2.0)
            if c is None or len(c) == 0:
                break
            out.append(c)

    t = threading.Thread(target=consumer)
    t.start()
    time.sleep(0.05)
    rb.write(np.arange(40, dtype=np.complex64))
    time.sleep(0.05)
    rb.close()
    t.join(timeout=2.0)
    got = np.concatenate(out)
    np.testing.assert_array_equal(got, np.arange(40, dtype=np.complex64))
    assert rb.read(4) is None  # closed and drained


# ---------------------------------------------------------------------------
# fakes
# ---------------------------------------------------------------------------

class FakeHackRF:
    """In-process libhackrf: records settings, runs the RX callback from a
    'USB' thread with s8 IQ buffers."""

    def __init__(self, n_buffers=4, buf_samples=4096):
        self.calls = []
        self.n_buffers = n_buffers
        self.buf_samples = buf_samples
        self.streaming = False
        self.iq = np.round(np.clip(
            RNG.standard_normal(2 * n_buffers * buf_samples) * 40,
            -127, 127)).astype(np.int8)

    def __getattr__(self, name):
        if not name.startswith("hackrf_"):
            raise AttributeError(name)

        def record(*args):
            self.calls.append((name, args))
            return 0
        return record

    def hackrf_init(self):
        self.calls.append(("hackrf_init", ()))
        return 0

    def hackrf_open(self, devp):
        self.calls.append(("hackrf_open", ()))
        cast(devp, POINTER(c_void_p))[0] = c_void_p(0xDEAD)
        return 0

    @property
    def hackrf_compute_baseband_filter_bw_round_down_lt(self):
        class F:
            restype = None

            def __call__(self, bw):
                # real ctypes with restype=c_uint32 returns a python int
                return int(bw.value * 3 // 4)
        return F()

    def hackrf_start_rx(self, dev, cb, ctx):
        self.calls.append(("hackrf_start_rx", ()))
        self.streaming = True

        from luaradio_tpu.blocks.sources.sdr import _hackrf_transfer

        def pump():
            for i in range(self.n_buffers):
                if not self.streaming:
                    break
                n = 2 * self.buf_samples
                seg = self.iq[i * n:(i + 1) * n]
                buf = (c_uint8 * n).from_buffer_copy(seg.tobytes())
                t = _hackrf_transfer(
                    device=dev, buffer=cast(buf, POINTER(c_uint8)),
                    buffer_length=n, valid_length=n)
                if cb(byref(t)) != 0:
                    break
        self._thread = threading.Thread(target=pump, daemon=True)
        self._thread.start()
        return 0

    def hackrf_stop_rx(self, dev):
        self.streaming = False
        self.calls.append(("hackrf_stop_rx", ()))
        return 0


def _called(fake, name):
    return [a for (n, a) in fake.calls if n == name]


def test_hackrf_source_streams_and_converts():
    from luaradio_tpu.blocks.sources.sdr import HackRFSource
    fake = FakeHackRF()
    HackRFSource._injected_lib = fake
    try:
        src = HackRFSource(100e6, 8e6, lna_gain=16, vga_gain=22,
                           rf_amplifier_enable=True)
        src.differentiate([])
        src.initialize()
        fake._thread.join(timeout=2.0)
        chunks = []
        while True:
            c = src.read(100000)
            if c is None or len(c) < 1:
                break
            chunks.append(c)
            if sum(map(len, chunks)) >= fake.n_buffers * fake.buf_samples:
                break
        got = np.concatenate(chunks)
        exp = (fake.iq.astype(np.float32) / 127.5).view(np.complex64)
        assert len(got) == len(exp)
        np.testing.assert_allclose(got, exp, atol=1e-6)
        # settings reached the hardware
        assert _called(fake, "hackrf_set_lna_gain")
        assert _called(fake, "hackrf_set_vga_gain")
        assert _called(fake, "hackrf_set_amp_enable")
        assert _called(fake, "hackrf_set_freq")
        src.cleanup()
        assert _called(fake, "hackrf_stop_rx")
        assert _called(fake, "hackrf_close")
    finally:
        HackRFSource._injected_lib = None


class FakeAirspy:
    """In-process libairspy: float32 IQ callback stream."""

    PREFIX = "airspy"

    def __init__(self, n_buffers=3, buf_samples=2048):
        self.calls = []
        self.n_buffers = n_buffers
        self.buf_samples = buf_samples
        self.iq = RNG.standard_normal(
            2 * n_buffers * buf_samples).astype(np.float32)

    def __getattr__(self, name):
        if not name.startswith(self.PREFIX + "_"):
            raise AttributeError(name)
        short = name[len(self.PREFIX) + 1:]
        if short == "open":
            def open_(devp):
                self.calls.append((short, ()))
                cast(devp, POINTER(c_void_p))[0] = c_void_p(0xBEEF)
                return 0
            return open_
        if short == "start_rx":
            return self._start_rx

        def record(*args):
            self.calls.append((short, args))
            return 0
        return record

    def _start_rx(self, dev, cb, ctx):
        self.calls.append(("start_rx", ()))
        from luaradio_tpu.blocks.sources.sdr import AirspySource

        transfer_t = AirspySource._TRANSFER

        def pump():
            for i in range(self.n_buffers):
                n = self.buf_samples
                seg = self.iq[2 * i * n:2 * (i + 1) * n]
                buf = (ctypes.c_float * (2 * n)).from_buffer_copy(
                    seg.tobytes())
                t = transfer_t(device=dev, ctx=None,
                               samples=cast(buf, c_void_p),
                               sample_count=n, dropped_samples=0,
                               sample_type=0)
                if cb(byref(t)) != 0:
                    break
        self._thread = threading.Thread(target=pump, daemon=True)
        self._thread.start()
        return 0


def test_airspy_source_streams_float_iq():
    from luaradio_tpu.blocks.sources.sdr import AirspySource
    fake = FakeAirspy()
    AirspySource._injected_lib = fake
    try:
        src = AirspySource(91.1e6, 6e6, gain_mode="custom", lna_gain=4,
                           mixer_gain=1, vga_gain=6, biastee_enable=True)
        src.differentiate([])
        src.initialize()
        fake._thread.join(timeout=2.0)
        total = fake.n_buffers * fake.buf_samples
        got = src.read(total)
        exp = fake.iq.view(np.complex64)
        np.testing.assert_array_equal(got, exp[:len(got)])
        names = [n for (n, _) in fake.calls]
        for s in ("set_sample_type", "set_samplerate", "set_lna_gain",
                  "set_mixer_gain", "set_vga_gain", "set_rf_bias",
                  "set_freq", "start_rx"):
            assert s in names, s
        src.cleanup()
        assert "stop_rx" in [n for (n, _) in fake.calls]
    finally:
        AirspySource._injected_lib = None


def test_airspy_gain_modes():
    from luaradio_tpu.blocks.sources.sdr import AirspySource
    fake = FakeAirspy(n_buffers=1)
    AirspySource._injected_lib = fake
    try:
        src = AirspySource(91.1e6, 6e6, gain_mode="linearity",
                           linearity_gain=8)
        src.differentiate([])
        src.initialize()
        assert "set_linearity_gain" in [n for (n, _) in fake.calls]
        src.cleanup()
    finally:
        AirspySource._injected_lib = None


class FakeBladeRF:
    """In-process libbladeRF: sync RX returns SC16_Q11 buffers."""

    def __init__(self, n_reads=3):
        self.calls = []
        self.n_reads = n_reads
        self.reads = 0
        self.data = np.round(np.clip(RNG.standard_normal(
            2 * n_reads * (1 << 16)) * 1000, -2048, 2047)).astype(np.int16)

    def __getattr__(self, name):
        if not name.startswith("bladerf_"):
            raise AttributeError(name)
        short = name[len("bladerf_"):]
        if short == "open":
            def open_(devp, devid):
                self.calls.append(("open", (devid,)))
                cast(devp, POINTER(c_void_p))[0] = c_void_p(0xB1AD)
                return 0
            return open_
        if short == "sync_rx":
            return self._sync_rx

        def record(*args):
            self.calls.append((short, args))
            return 0
        return record

    def _sync_rx(self, dev, buf, n, meta, timeout):
        if self.reads >= self.n_reads:
            return -1  # stream end
        n = n.value if hasattr(n, "value") else int(n)
        seg = self.data[2 * self.reads * n:2 * (self.reads + 1) * n]
        ctypes.memmove(buf, seg.ctypes.data, seg.nbytes)
        self.reads += 1
        return 0


def test_bladerf_source_sync_reads():
    from luaradio_tpu.blocks.sources.sdr import BladeRFSource
    fake = FakeBladeRF()
    BladeRFSource._injected_lib = fake
    try:
        src = BladeRFSource(915e6, 10e6, gain=20, autogain=False)
        src.differentiate([])
        src.initialize()
        total = fake.n_reads * (1 << 16)
        chunks = []
        while sum(map(len, chunks)) < total:
            c = src.read(total)
            if c is None:
                break
            chunks.append(c)
        got = np.concatenate(chunks)
        exp = (fake.data.astype(np.float32) / 2048.0).view(np.complex64)
        np.testing.assert_allclose(got, exp[:len(got)], atol=1e-6)
        names = [n for (n, _) in fake.calls]
        for s in ("set_sample_rate", "set_bandwidth", "set_gain_mode",
                  "set_gain", "set_frequency", "sync_config",
                  "enable_module"):
            assert s in names, s
        src.cleanup()
    finally:
        BladeRFSource._injected_lib = None


class FakeHackRFTx(FakeHackRF):
    """TX side: pulls from the block's ring via the TX callback."""

    def __init__(self, n_buffers=3, buf_samples=2048):
        super().__init__(n_buffers, buf_samples)
        self.sent = []

    def hackrf_start_tx(self, dev, cb, ctx):
        self.calls.append(("hackrf_start_tx", ()))
        from luaradio_tpu.blocks.sources.sdr import _hackrf_transfer

        def pump():
            for _ in range(self.n_buffers):
                n = 2 * self.buf_samples
                buf = (c_uint8 * n)()
                t = _hackrf_transfer(device=dev,
                                     buffer=cast(buf, POINTER(c_uint8)),
                                     buffer_length=n, valid_length=0)
                if cb(byref(t)) != 0:
                    break
                self.sent.append(np.frombuffer(
                    bytes(buf), dtype=np.int8).copy())
        self._tx_thread = threading.Thread(target=pump, daemon=True)
        self._tx_thread.start()
        return 0

    def hackrf_stop_tx(self, dev):
        self.calls.append(("hackrf_stop_tx", ()))
        return 0


def test_hackrf_sink_transmits():
    from luaradio_tpu.blocks.sinks.sdr import HackRFSink
    fake = FakeHackRFTx()
    HackRFSink._injected_lib = fake
    try:
        from luaradio_tpu.types import ComplexFloat32
        sink = HackRFSink(433e6, vga_gain=20)
        sink.differentiate([ComplexFloat32])
        sink.input_rate = 2e6
        x = (RNG.standard_normal(2 * fake.buf_samples)
             + 1j * RNG.standard_normal(2 * fake.buf_samples)
             ).astype(np.complex64) * 0.5
        sink.initialize()
        sink.process(x)
        fake._tx_thread.join(timeout=2.0)
        sent = np.concatenate(fake.sent)
        exp = np.clip(x.view(np.float32) * 127.0, -128, 127).astype(np.int8)
        n = min(len(sent), len(exp))
        assert n >= 2 * fake.buf_samples
        np.testing.assert_array_equal(sent[:n], exp[:n])
        assert [c for (c, _) in fake.calls if c == "hackrf_set_txvga_gain"]
        sink.cleanup()
    finally:
        HackRFSink._injected_lib = None


def test_missing_library_raises_clear_error():
    from luaradio_tpu.blocks.sources.sdr import AirspyHFSource
    src = AirspyHFSource(7.1e6, 192e3)
    src.differentiate([])
    src.LIBRARY_NAMES = ("definitely_not_a_real_library_xyz",)
    with pytest.raises(RuntimeError, match="vendor library not found"):
        src.initialize()
