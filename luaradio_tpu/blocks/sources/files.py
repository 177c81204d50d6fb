"""File sources: IQ, real, raw, WAV, JSON.

TPU-native equivalents of /root/reference/radio/blocks/sources/{iqfile,
realfile,rawfile,wavfile,json}.lua.  These are host blocks: they read bytes
and convert to numpy sample arrays (vectorized, unlike the reference's
per-sample Lua loops); the runtime transfers chunks to the device
asynchronously.
"""

from __future__ import annotations

import json as _json
import struct

import numpy as np

from luaradio_tpu.core.block import HostSourceBlock, Output
from luaradio_tpu.types import (Bit, Byte, ComplexFloat32, Float32, SampleType,
                                object_type)
from luaradio_tpu.utils import format as format_utils


def _open_readable(file):
    if isinstance(file, str):
        return open(file, "rb"), True
    if isinstance(file, int):
        import os
        return os.fdopen(file, "rb"), True
    return file, False


class _FileSourceBase(HostSourceBlock):
    def __init__(self, file, rate: float | None, repeat_on_eof: bool = False):
        super().__init__()
        self._file_arg = file
        self.rate = rate
        self.repeat_on_eof = repeat_on_eof
        self.file = None

    def initialize(self):
        if self.file is None:
            self.file, self._owns = _open_readable(self._file_arg)

    def cleanup(self):
        if self.file is not None and getattr(self, "_owns", False):
            self.file.close()
            self.file = None

    def _read_bytes(self, nbytes: int) -> bytes:
        buf = self.file.read(nbytes)
        while self.repeat_on_eof and len(buf) < nbytes:
            self.file.seek(0)
            more = self.file.read(nbytes - len(buf))
            if not more:
                break
            buf += more
        return buf


class IQFileSource(_FileSourceBase):
    """Complex samples from an interleaved-I/Q binary file in any of the 14
    scalar wire formats (reference: iqfile.lua:82-116)."""

    def __init__(self, file, format: str, rate: float,
                 repeat_on_eof: bool = False):
        super().__init__(file, rate, repeat_on_eof)
        self.format = format_utils.get_format(format)
        self.add_type_signature([], [Output("out", ComplexFloat32)])

    def read(self, n: int):
        buf = self._read_bytes(n * 2 * self.format.itemsize)
        if not buf:
            return None
        return format_utils.bytes_to_complex(buf, self.format)


class RealFileSource(_FileSourceBase):
    """Float32 samples from a binary file (reference: realfile.lua)."""

    def __init__(self, file, format: str, rate: float,
                 repeat_on_eof: bool = False):
        super().__init__(file, rate, repeat_on_eof)
        self.format = format_utils.get_format(format)
        self.add_type_signature([], [Output("out", Float32)])

    def read(self, n: int):
        buf = self._read_bytes(n * self.format.itemsize)
        if not buf:
            return None
        return format_utils.bytes_to_real(buf, self.format)


class RawFileSource(_FileSourceBase):
    """Native in-memory sample stream of any basic type (reference:
    rawfile.lua — reads the CStruct wire format directly)."""

    def __init__(self, file, data_type: SampleType, rate: float,
                 repeat_on_eof: bool = False):
        super().__init__(file, rate, repeat_on_eof)
        self.data_type = data_type
        self.add_type_signature([], [Output("out", data_type)])

    def read(self, n: int):
        item = self.data_type.dtype.itemsize
        buf = self._read_bytes(n * item)
        if not buf:
            return None
        count = len(buf) // item
        return np.frombuffer(buf[:count * item], dtype=self.data_type.dtype)


class WAVFileSource(HostSourceBlock):
    """PCM/float WAV file source, one Float32 output per channel
    (reference: wavfile.lua — RIFF parse, u8/s16/s32 PCM support)."""

    _FMT_DTYPES = {(1, 8): np.dtype("u1"), (1, 16): np.dtype("<i2"),
                   (1, 32): np.dtype("<i4"), (3, 32): np.dtype("<f4"),
                   (3, 64): np.dtype("<f8")}

    def __init__(self, file, num_channels: int, repeat_on_eof: bool = False):
        super().__init__()
        self._file_arg = file
        self.num_channels = int(num_channels)
        self.repeat_on_eof = repeat_on_eof
        self.file = None
        if num_channels == 1:
            self.add_type_signature([], [Output("out", Float32)])
        else:
            self.add_type_signature(
                [], [Output(f"out{i+1}", Float32) for i in range(num_channels)])

    def initialize(self):
        if self.file is not None:
            return
        self.file, self._owns = _open_readable(self._file_arg)
        riff, size, wave = struct.unpack("<4sI4s", self.file.read(12))
        if riff != b"RIFF" or wave != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        fmt = None
        while True:
            hdr = self.file.read(8)
            if len(hdr) < 8:
                raise ValueError("WAV: no data chunk found")
            cid, csz = struct.unpack("<4sI", hdr)
            if cid == b"fmt ":
                data = self.file.read(csz)
                (tag, nch, rate, _br, _ba, bits) = struct.unpack(
                    "<HHIIHH", data[:16])
                fmt = (tag, nch, rate, bits)
            elif cid == b"data":
                self._data_start = self.file.tell()
                self._data_size = csz
                break
            else:
                self.file.seek(csz + (csz & 1), 1)
        if fmt is None:
            raise ValueError("WAV: no fmt chunk found")
        tag, nch, rate, bits = fmt
        if nch != self.num_channels:
            raise ValueError(f"WAV has {nch} channels, expected "
                             f"{self.num_channels}")
        if (tag, bits) not in self._FMT_DTYPES:
            raise ValueError(f"unsupported WAV format tag={tag} bits={bits}")
        self.rate = float(rate)
        self._dtype = self._FMT_DTYPES[(tag, bits)]
        self._bits = bits
        self._tag = tag
        self._read_bytes_left = self._data_size

    def get_rate(self):
        if self.rate is None:
            self.initialize()
        return float(self.rate)

    def read(self, n: int):
        item = self._dtype.itemsize * self.num_channels
        want = min(n * item, self._read_bytes_left)
        buf = self.file.read(want) if want > 0 else b""
        self._read_bytes_left -= len(buf)
        if not buf:
            if self.repeat_on_eof:
                self.file.seek(self._data_start)
                self._read_bytes_left = self._data_size
                buf = self.file.read(min(n * item, self._read_bytes_left))
                self._read_bytes_left -= len(buf)
            if not buf:
                return None
        count = len(buf) // item
        raw = np.frombuffer(buf[:count * item], dtype=self._dtype)
        raw = raw.reshape(-1, self.num_channels)
        if self._tag == 3:
            f = raw.astype(np.float32)
        elif self._bits == 8:
            f = ((raw.astype(np.float32) - 127.5) / 127.5)
        else:
            scale = float(2 ** (self._bits - 1) - 0.5)
            f = (raw.astype(np.float32) / scale)
        if self.num_channels == 1:
            return f[:, 0]
        return tuple(np.ascontiguousarray(f[:, i])
                     for i in range(self.num_channels))

    def cleanup(self):
        if self.file is not None and getattr(self, "_owns", False):
            self.file.close()
            self.file = None


class JSONSource(HostSourceBlock):
    """Newline-delimited JSON object stream source (reference: json.lua).
    Emits host-side object samples at the given rate."""

    def __init__(self, file, rate: float):
        super().__init__()
        self._file_arg = file
        self.rate = rate
        self.file = None
        self.add_type_signature([], [Output("out", object_type("JSONObject"))])

    def initialize(self):
        if self.file is None:
            if isinstance(self._file_arg, str):
                self.file = open(self._file_arg, "r")
                self._owns = True
            else:
                self.file = self._file_arg
                self._owns = False

    def read(self, n: int):
        out = []
        for _ in range(n):
            line = self.file.readline()
            if not line:
                break
            line = line.strip()
            if line:
                out.append(_json.loads(line))
        if not out:
            return None
        return out

    def cleanup(self):
        if self.file is not None and getattr(self, "_owns", False):
            self.file.close()
            self.file = None


__all__ = ["IQFileSource", "RealFileSource", "RawFileSource", "WAVFileSource",
           "JSONSource"]
