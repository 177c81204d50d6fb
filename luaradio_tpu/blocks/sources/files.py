"""File sources: IQ, real, raw, WAV, JSON.

TPU-native equivalents of /root/reference/radio/blocks/sources/{iqfile,
realfile,rawfile,wavfile,json}.lua.  These are host blocks: they read bytes
and convert to numpy sample arrays (vectorized, unlike the reference's
per-sample Lua loops); the runtime transfers chunks to the device
asynchronously.
"""

from __future__ import annotations

import json as _json
import mmap
import struct

import numpy as np

from luaradio_tpu.core.block import HostSourceBlock, Output
from luaradio_tpu.types import (Bit, Byte, ComplexFloat32, Float32, SampleType,
                                object_type)
from luaradio_tpu.utils import format as format_utils

#: wire formats whose raw->float conversion is exact in float32 arithmetic;
#: these may be converted ON DEVICE (HostSourceBlock.wire_read contract) so
#: only the 1-2 byte/sample wire bytes cross the host->device link, which is
#: the scarce resource of the ingest path (32-bit formats stay on the host
#: float64 path for bit-identical rounding).
_DEVICE_CONVERT_FORMATS = {
    "u8", "s8", "u16le", "u16be", "s16le", "s16be",
}


def _open_readable(file):
    if isinstance(file, str):
        return open(file, "rb"), True
    if isinstance(file, int):
        import os
        return os.fdopen(file, "rb"), True
    return file, False


class _FileSourceBase(HostSourceBlock):
    """Base for binary file sources.

    ``resident`` controls the device-resident loop mode for repeating
    sources: a ``repeat_on_eof`` file whose decoded payload fits the budget
    (LUARADIO_TPU_RESIDENT_BUDGET bytes, default 256 MiB) is uploaded to
    device HBM ONCE and every subsequent chunk is a device-side window over
    the ring — zero host->device traffic in steady state.  The reference
    re-reads and re-converts the file every pass (iqfile.lua:82-116); on a
    TPU the host link is the scarcest resource in the whole pipeline, so a
    periodic stream belongs in HBM.  ``None`` (default) = auto-enable when
    eligible; False = always stream from the host.
    """

    def __init__(self, file, rate: float | None, repeat_on_eof: bool = False,
                 resident: bool | None = None):
        super().__init__()
        self._file_arg = file
        self.rate = rate
        self.repeat_on_eof = repeat_on_eof
        self.resident = resident
        self.file = None
        self._mm = None
        self._res_buf = None

    def initialize(self):
        if self.file is None:
            self.file, self._owns = _open_readable(self._file_arg)
        if self._mm is None:
            # mmap path-backed files: reads become zero-copy page-cache
            # views instead of read() copies (reference iqfile.lua uses
            # stdio fread; the pump overlaps this with device transfer).
            try:
                self._mm = mmap.mmap(self.file.fileno(), 0,
                                     access=mmap.ACCESS_READ)
                self._mm_pos = self.file.tell()
            except (OSError, ValueError):
                self._mm = None

    def cleanup(self):
        if self._mm is not None:
            self._mm.close()
            self._mm = None
        if self.file is not None and getattr(self, "_owns", False):
            self.file.close()
            self.file = None

    def _read_bytes(self, nbytes: int) -> bytes:
        if self._mm is not None:
            return self._read_bytes_mm(nbytes)
        buf = self.file.read(nbytes)
        while self.repeat_on_eof and len(buf) < nbytes:
            self.file.seek(0)
            more = self.file.read(nbytes - len(buf))
            if not more:
                break
            buf += more
        return buf

    def _read_bytes_mm(self, nbytes: int):
        mm, size = self._mm, len(self._mm)
        pos = self._mm_pos
        end = min(pos + nbytes, size)
        buf = mm[pos:end]
        self._mm_pos = end
        while self.repeat_on_eof and len(buf) < nbytes and size > 0:
            take = min(nbytes - len(buf), size)
            buf += mm[0:take]
            self._mm_pos = take % size if take == size else take
        return buf

    # -- device-resident loop mode -----------------------------------------
    def _whole_file_bytes(self):
        if self._mm is not None:
            return self._mm[:]
        try:
            pos = self.file.tell()
            self.file.seek(0)
            buf = self.file.read()
            self.file.seek(pos)
            return buf
        except (OSError, ValueError):
            return None

    def _decode_all(self):
        """Decode the ENTIRE file into its 1-D boundary payload.  Returns
        (payload ndarray, n_samples, items_per_sample) or None when the
        file is empty/unseekable.  Overridden per concrete source."""
        return None

    def _file_nbytes(self):
        """File size in bytes without reading it, or None when unseekable."""
        if self._mm is not None:
            return len(self._mm)
        try:
            import os
            return os.fstat(self.file.fileno()).st_size
        except (OSError, ValueError, AttributeError):
            try:
                pos = self.file.tell()
                self.file.seek(0, 2)
                size = self.file.tell()
                self.file.seek(pos)
                return size
            except (OSError, ValueError):
                return None

    def _payload_nbytes_bound(self, file_bytes: int) -> int:
        """Upper bound on the decoded payload size for ``file_bytes`` of
        wire data (worst case: u8 wire items expanding to float32 = 4x).
        Lets resident_setup reject oversized files from the size alone,
        without decoding them into host memory first."""
        return file_bytes * 4

    def _resident_budget(self) -> int:
        import os
        try:
            return int(os.environ.get("LUARADIO_TPU_RESIDENT_BUDGET",
                                      256 << 20))
        except ValueError:
            return 256 << 20

    def resident_setup(self, chunk: int) -> bool:
        """Try to enter device-resident loop mode for `chunk`-sample reads.
        Called by the fused runtime for repeat_on_eof sources whose outputs
        feed only device blocks."""
        if self.resident is False or not self.repeat_on_eof:
            return False
        self.initialize()
        # Size gate BEFORE decoding: a multi-GB looping file must not be
        # decoded into host memory just to be rejected against the budget.
        size = self._file_nbytes()
        if size is not None and \
                self._payload_nbytes_bound(size) > self._resident_budget():
            return False
        decoded = self._decode_all()
        if decoded is None:
            return False
        payload, n, k = decoded
        if n == 0 or payload.nbytes > self._resident_budget():
            return False
        import jax
        import jax.numpy as jnp
        from jax import lax

        # ring extended by one chunk so every window is contiguous (windows
        # start anywhere in the first period and span up to chunk*k more)
        L, C = payload.shape[0], chunk * k
        reps = -(-(L + C) // L)
        ext = np.tile(payload, reps)[:L + C]
        self._res_buf = jax.device_put(ext)
        self._res_n = n
        self._res_k = k
        self._res_pos = 0
        self._res_chunk = chunk

        def window(buf, start):
            return lax.dynamic_slice(buf, (start,), (chunk * k,))
        self._res_window = jax.jit(window)
        return True

    def resident_read(self, n: int):
        """One chunk from the device-resident ring (no host traffic)."""
        out = self._res_window(self._res_buf,
                               np.int32(self._res_pos * self._res_k))
        self._res_pos = (self._res_pos + n) % self._res_n
        return out

    def resident_window_args(self, n: int):
        """(ring array, window start item) for this chunk and advance —
        the mesh runtime slices the window inside the sharded program
        (core/runtime.py resident_ingest).  The start is a 0-d ndarray so
        the multihost runtime commits it as a replicated global scalar
        like any other external input."""
        start = np.asarray(self._res_pos * self._res_k, np.int32)
        self._res_pos = (self._res_pos + n) % self._res_n
        return self._res_buf, start


def _make_wire_ingest(fmt):
    """Build the on-device raw -> float32 converter for an exact-in-f32
    wire format: float = (raw - offset) / scale, elementwise on the VPU."""
    offset = np.float32(fmt.offset)
    scale = np.float32(fmt.scale)

    def ingest(raw):
        import jax.numpy as jnp
        return (raw.astype(jnp.float32) - offset) / scale
    return ingest


class _WireFileSource(_FileSourceBase):
    """Shared wire-ingest implementation for IQ/Real file sources.

    ``_wire_factor`` is wire items per sample (2 for interleaved I/Q)."""

    _wire_factor = 1

    def _payload_nbytes_bound(self, file_bytes: int) -> int:
        # wire-ingest formats keep the wire dtype on device (same bytes);
        # host-decoded formats expand each wire item to a float32
        if self.format.name in _DEVICE_CONVERT_FORMATS:
            return file_bytes
        return (file_bytes // self.format.itemsize) * 4

    def device_ingest(self):
        if self.format.name in _DEVICE_CONVERT_FORMATS:
            return _make_wire_ingest(self.format)
        return None

    def wire_read(self, n: int):
        item = self.format.itemsize
        k = self._wire_factor
        buf = self._read_bytes(n * k * item)
        if not buf:
            return None
        count = len(buf) // (k * item)
        raw = np.frombuffer(buf, dtype=self.format.dtype, count=count * k)
        if self.format.dtype.byteorder == ">":
            raw = raw.astype(self.format.dtype.newbyteorder("="))
        return raw, count


class IQFileSource(_WireFileSource):
    """Complex samples from an interleaved-I/Q binary file in any of the 14
    scalar wire formats (reference: iqfile.lua:82-116)."""

    _wire_factor = 2

    def __init__(self, file, format: str, rate: float,
                 repeat_on_eof: bool = False, resident: bool | None = None):
        super().__init__(file, rate, repeat_on_eof, resident)
        self.format = format_utils.get_format(format)
        self.add_type_signature([], [Output("out", ComplexFloat32)])

    def read(self, n: int):
        buf = self._read_bytes(n * 2 * self.format.itemsize)
        if not buf:
            return None
        return format_utils.bytes_to_complex(buf, self.format)

    def _decode_all(self):
        buf = self._whole_file_bytes()
        if not buf:
            return None
        item = self.format.itemsize
        n = len(buf) // (2 * item)
        if self.device_ingest() is not None:
            raw = np.frombuffer(buf, dtype=self.format.dtype, count=2 * n)
            if self.format.dtype.byteorder == ">":
                raw = raw.astype(self.format.dtype.newbyteorder("="))
            return raw, n, 2
        z = format_utils.bytes_to_complex(buf[:n * 2 * item], self.format)
        return z.view(np.float32), n, 2


class RealFileSource(_WireFileSource):
    """Float32 samples from a binary file (reference: realfile.lua)."""

    def __init__(self, file, format: str, rate: float,
                 repeat_on_eof: bool = False, resident: bool | None = None):
        super().__init__(file, rate, repeat_on_eof, resident)
        self.format = format_utils.get_format(format)
        self.add_type_signature([], [Output("out", Float32)])

    def read(self, n: int):
        buf = self._read_bytes(n * self.format.itemsize)
        if not buf:
            return None
        return format_utils.bytes_to_real(buf, self.format)

    def _decode_all(self):
        buf = self._whole_file_bytes()
        if not buf:
            return None
        item = self.format.itemsize
        n = len(buf) // item
        if self.device_ingest() is not None:
            raw = np.frombuffer(buf, dtype=self.format.dtype, count=n)
            if self.format.dtype.byteorder == ">":
                raw = raw.astype(self.format.dtype.newbyteorder("="))
            return raw, n, 1
        return format_utils.bytes_to_real(buf[:n * item], self.format), n, 1


class RawFileSource(_FileSourceBase):
    """Native in-memory sample stream of any basic type (reference:
    rawfile.lua — reads the CStruct wire format directly)."""

    def __init__(self, file, data_type: SampleType, rate: float,
                 repeat_on_eof: bool = False, resident: bool | None = None):
        super().__init__(file, rate, repeat_on_eof, resident)
        self.data_type = data_type
        self.add_type_signature([], [Output("out", data_type)])

    def _payload_nbytes_bound(self, file_bytes: int) -> int:
        return file_bytes  # payload is the file's dtype, viewed in place

    def read(self, n: int):
        item = self.data_type.dtype.itemsize
        buf = self._read_bytes(n * item)
        if not buf:
            return None
        count = len(buf) // item
        return np.frombuffer(buf[:count * item], dtype=self.data_type.dtype)

    def _decode_all(self):
        buf = self._whole_file_bytes()
        if not buf:
            return None
        dt = self.data_type.dtype
        n = len(buf) // dt.itemsize
        arr = np.frombuffer(buf[:n * dt.itemsize], dtype=dt)
        if dt.kind == "c":
            return arr.view(np.float32), n, 2
        return arr, n, 1


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
