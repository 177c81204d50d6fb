"""SDR hardware sources.

TPU-native equivalents of /root/reference/radio/blocks/sources/{rtlsdr,
airspy,airspyhf,hackrf,hydrasdr,sdrplay,bladerf,uhd,soapysdr}.lua.

The reference reaches vendor C libraries through LuaJIT FFI with async read
callbacks; here each driver is a ctypes binding doing synchronous reads on
the host, feeding the device-resident pipeline (SURVEY §2.9: hardware ingest
is host-side; file/network replay is the primary path on a TPU pod).  A
missing vendor library raises a clear error at initialize() — hardware
blocks are constructible without hardware, like the reference.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

from luaradio_tpu.core.block import HostSourceBlock, Output
from luaradio_tpu.types import ComplexFloat32


def _load_library(*names):
    for name in names:
        path = ctypes.util.find_library(name)
        if path:
            try:
                return ctypes.CDLL(path)
            except OSError:
                continue
        try:
            return ctypes.CDLL(f"lib{name}.so")
        except OSError:
            continue
    return None


class _SDRSourceBase(HostSourceBlock):
    """Common scaffolding: ComplexFloat32 output at a tuned frequency."""

    LIBRARY_NAMES: tuple = ()

    def __init__(self, frequency: float, rate: float, **options):
        super().__init__()
        self.frequency = float(frequency)
        self.rate = float(rate)
        self.options = options
        self.add_type_signature([], [Output("out", ComplexFloat32)])

    def _require_library(self):
        lib = _load_library(*self.LIBRARY_NAMES)
        if lib is None:
            raise RuntimeError(
                f"{self.name}: vendor library not found "
                f"(tried {', '.join(self.LIBRARY_NAMES)}); install the "
                f"driver or use a file/network source")
        return lib


class RtlSdrSource(_SDRSourceBase):
    """RTL-SDR dongle source (reference: rtlsdr.lua — librtlsdr via FFI;
    here: ctypes + synchronous reads).

    Options: freq_correction (ppm), gain (dB, None = autogain),
    bias_tee (bool).
    """

    LIBRARY_NAMES = ("rtlsdr",)
    _CHUNK = 16384

    def initialize(self):
        lib = self._require_library()
        self._lib = lib
        dev = ctypes.c_void_p()
        if lib.rtlsdr_open(ctypes.byref(dev), 0) != 0:
            raise RuntimeError("rtlsdr_open() failed (no device?)")
        self._dev = dev
        lib.rtlsdr_set_sample_rate(dev, int(self.rate))
        lib.rtlsdr_set_center_freq(dev, int(self.frequency))
        ppm = int(self.options.get("freq_correction", 0))
        if ppm:
            lib.rtlsdr_set_freq_correction(dev, ppm)
        gain = self.options.get("gain")
        if gain is None:
            lib.rtlsdr_set_tuner_gain_mode(dev, 0)  # autogain
        else:
            lib.rtlsdr_set_tuner_gain_mode(dev, 1)
            lib.rtlsdr_set_tuner_gain(dev, int(gain * 10))
        if self.options.get("bias_tee"):
            lib.rtlsdr_set_bias_tee(dev, 1)
        lib.rtlsdr_reset_buffer(dev)

    def read(self, n: int):
        want = min(max(n, 1), 1 << 20)
        nbytes = 2 * want
        nbytes -= nbytes % 512  # librtlsdr requires multiples of 512
        nbytes = max(nbytes, 512)
        buf = (ctypes.c_uint8 * nbytes)()
        got = ctypes.c_int(0)
        r = self._lib.rtlsdr_read_sync(self._dev, buf, nbytes,
                                       ctypes.byref(got))
        if r != 0 or got.value <= 0:
            return None
        raw = np.frombuffer(bytes(buf)[:got.value], dtype=np.uint8)
        raw = raw[:(len(raw) // 2) * 2].astype(np.float32)
        iq = (raw - 127.5) / 127.5
        return (iq[0::2] + 1j * iq[1::2]).astype(np.complex64)

    def cleanup(self):
        if getattr(self, "_dev", None):
            self._lib.rtlsdr_close(self._dev)
            self._dev = None


class SoapySDRSource(_SDRSourceBase):
    """Generic SoapySDR source covering most vendor hardware through one
    API (reference: soapysdr.lua).  Uses the SoapySDR Python bindings when
    installed, else raises."""

    LIBRARY_NAMES = ("SoapySDR",)

    def __init__(self, uri: str, frequency: float, rate: float, **options):
        super().__init__(frequency, rate, **options)
        self.uri = uri

    def initialize(self):
        try:
            import SoapySDR  # noqa: F401
            from SoapySDR import SOAPY_SDR_CF32, SOAPY_SDR_RX
        except ImportError as e:
            raise RuntimeError(
                f"{self.name}: SoapySDR Python bindings not installed") from e
        self._soapy = SoapySDR
        self._dev = SoapySDR.Device(self.uri)
        self._dev.setSampleRate(SOAPY_SDR_RX, 0, self.rate)
        self._dev.setFrequency(SOAPY_SDR_RX, 0, self.frequency)
        for key, value in self.options.get("settings", {}).items():
            self._dev.writeSetting(key, value)
        if "gain" in self.options:
            self._dev.setGain(SOAPY_SDR_RX, 0, self.options["gain"])
        self._stream = self._dev.setupStream(SOAPY_SDR_RX, SOAPY_SDR_CF32)
        self._dev.activateStream(self._stream)

    def read(self, n: int):
        buf = np.zeros(min(n, 1 << 17), dtype=np.complex64)
        sr = self._dev.readStream(self._stream, [buf], len(buf))
        if sr.ret <= 0:
            return None
        return buf[:sr.ret]

    def cleanup(self):
        if getattr(self, "_stream", None):
            self._dev.deactivateStream(self._stream)
            self._dev.closeStream(self._stream)
            self._stream = None


class _UnboundSDRSource(_SDRSourceBase):
    """Vendor drivers whose C APIs need per-device streaming state machines;
    these report a clear unavailability error and point at SoapySDR, which
    supports all of them through its vendor modules."""

    def initialize(self):
        raise RuntimeError(
            f"{self.name}: direct driver binding not available in this "
            f"build; use SoapySDRSource (driver=...) for this hardware, or "
            f"a file/network source")

    def read(self, n: int):  # pragma: no cover
        raise RuntimeError(f"{self.name}: not initialized")


class AirspySource(_UnboundSDRSource):
    """Airspy R2/Mini source (reference: airspy.lua)."""
    LIBRARY_NAMES = ("airspy",)


class AirspyHFSource(_UnboundSDRSource):
    """Airspy HF+ source (reference: airspyhf.lua)."""
    LIBRARY_NAMES = ("airspyhf",)


class HackRFSource(_UnboundSDRSource):
    """HackRF One source (reference: hackrf.lua)."""
    LIBRARY_NAMES = ("hackrf",)


class HydraSDRSource(_UnboundSDRSource):
    """HydraSDR RFOne source (reference: hydrasdr.lua)."""
    LIBRARY_NAMES = ("hydrasdr",)


class SDRplaySource(_UnboundSDRSource):
    """SDRplay RSP source (reference: sdrplay.lua)."""
    LIBRARY_NAMES = ("sdrplay_api", "mirsdrapi-rsp")


class BladeRFSource(_UnboundSDRSource):
    """Nuand bladeRF source (reference: bladerf.lua)."""
    LIBRARY_NAMES = ("bladeRF",)


class UHDSource(_UnboundSDRSource):
    """Ettus USRP source (reference: uhd.lua)."""
    LIBRARY_NAMES = ("uhd",)

    def __init__(self, device: str, frequency: float, rate: float, **options):
        super().__init__(frequency, rate, **options)
        self.device = device


__all__ = ["RtlSdrSource", "SoapySDRSource", "AirspySource", "AirspyHFSource",
           "HackRFSource", "HydraSDRSource", "SDRplaySource", "BladeRFSource",
           "UHDSource"]
