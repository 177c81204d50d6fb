"""SDR hardware transmit sinks.

TPU-native equivalents of /root/reference/radio/blocks/sinks/{hackrf,uhd,
soapysdr,bladerf}.lua.  SoapySDR (which fronts all of this hardware through
vendor modules) gets a working binding via its Python API; the direct
vendor-library sinks report clear unavailability and point at SoapySDR,
matching the ingest-side policy (blocks/sources/sdr.py).
"""

from __future__ import annotations

import numpy as np

from luaradio_tpu.core.block import Input, SinkBlock
from luaradio_tpu.types import ComplexFloat32


class _SDRSinkBase(SinkBlock):
    LIBRARY_NAMES: tuple = ()

    def __init__(self, frequency: float, **options):
        super().__init__()
        self.frequency = float(frequency)
        self.options = options
        self.add_type_signature([Input("in", ComplexFloat32)], [])


class SoapySDRSink(_SDRSinkBase):
    """Generic SoapySDR transmit sink (reference: soapysdr.lua)."""

    def __init__(self, uri: str, frequency: float, **options):
        super().__init__(frequency, **options)
        self.uri = uri

    def initialize(self):
        try:
            import SoapySDR  # noqa: F401
            from SoapySDR import SOAPY_SDR_CF32, SOAPY_SDR_TX
        except ImportError as e:
            raise RuntimeError(
                f"{self.name}: SoapySDR Python bindings not installed") from e
        self._dev = SoapySDR.Device(self.uri)
        from SoapySDR import SOAPY_SDR_TX, SOAPY_SDR_CF32
        self._dev.setSampleRate(SOAPY_SDR_TX, 0, self.get_rate())
        self._dev.setFrequency(SOAPY_SDR_TX, 0, self.frequency)
        if "gain" in self.options:
            self._dev.setGain(SOAPY_SDR_TX, 0, self.options["gain"])
        self._stream = self._dev.setupStream(SOAPY_SDR_TX, SOAPY_SDR_CF32)
        self._dev.activateStream(self._stream)

    def process(self, x):
        buf = np.ascontiguousarray(np.asarray(x, dtype=np.complex64))
        pos = 0
        while pos < len(buf):
            sr = self._dev.writeStream(self._stream, [buf[pos:]],
                                       len(buf) - pos)
            if sr.ret <= 0:
                raise RuntimeError(f"{self.name}: writeStream error {sr.ret}")
            pos += sr.ret

    def cleanup(self):
        if getattr(self, "_stream", None):
            self._dev.deactivateStream(self._stream)
            self._dev.closeStream(self._stream)
            self._stream = None


class _UnboundSDRSink(_SDRSinkBase):
    def initialize(self):
        raise RuntimeError(
            f"{self.name}: direct driver binding not available in this "
            f"build; use SoapySDRSink (driver=...) for this hardware")

    def process(self, x):  # pragma: no cover
        raise RuntimeError(f"{self.name}: not initialized")


class HackRFSink(_UnboundSDRSink):
    """HackRF One transmit sink (reference: sinks/hackrf.lua)."""
    LIBRARY_NAMES = ("hackrf",)


class UHDSink(_UnboundSDRSink):
    """Ettus USRP transmit sink (reference: sinks/uhd.lua)."""
    LIBRARY_NAMES = ("uhd",)

    def __init__(self, device: str, frequency: float, **options):
        super().__init__(frequency, **options)
        self.device = device


class BladeRFSink(_UnboundSDRSink):
    """Nuand bladeRF transmit sink (reference: sinks/bladerf.lua)."""
    LIBRARY_NAMES = ("bladeRF",)


__all__ = ["SoapySDRSink", "HackRFSink", "UHDSink", "BladeRFSink"]
