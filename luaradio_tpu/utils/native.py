"""ctypes binding for the native format-conversion library.

Loads native/build/libluaradio_tpu_native.so when built (see
native/Makefile); utils.format uses these kernels for the host wire-format
hot path and falls back to vectorized numpy when the library is absent —
the same graceful degradation the reference applies to its acceleration
libraries (platform.features, /root/reference/radio/core/platform.lua:297).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build",
                 "libluaradio_tpu_native.so"),
    "libluaradio_tpu_native.so",
]


def _load():
    if os.environ.get("LUARADIO_TPU_DISABLE_NATIVE"):
        return None
    for path in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(path)
                              if os.path.sep in path else path)
            break
        except OSError:
            lib = None
    if lib is None:
        return None
    for name in _TO_F32.values():
        getattr(lib, name).restype = None
    for name in _FROM_F32.values():
        getattr(lib, name).restype = None
    return lib


# format name -> native converter (raw -> f32)
_TO_F32 = {
    "u8": "lrtpu_u8_to_f32", "s8": "lrtpu_s8_to_f32",
    "u16le": "lrtpu_u16_to_f32", "s16le": "lrtpu_s16_to_f32",
    "u16be": "lrtpu_u16s_to_f32", "s16be": "lrtpu_s16s_to_f32",
    "u32le": "lrtpu_u32_to_f32", "s32le": "lrtpu_s32_to_f32",
    "u32be": "lrtpu_u32s_to_f32", "s32be": "lrtpu_s32s_to_f32",
    "f32le": "lrtpu_f32_copy", "f32be": "lrtpu_f32s_to_f32",
    "f64le": "lrtpu_f64_to_f32", "f64be": "lrtpu_f64s_to_f32",
}

_FROM_F32 = {
    "u8": "lrtpu_f32_to_u8", "s8": "lrtpu_f32_to_s8",
    "u16le": "lrtpu_f32_to_u16", "s16le": "lrtpu_f32_to_s16",
    "u16be": "lrtpu_f32_to_u16s", "s16be": "lrtpu_f32_to_s16s",
    "u32le": "lrtpu_f32_to_u32", "s32le": "lrtpu_f32_to_s32",
    "u32be": "lrtpu_f32_to_u32s", "s32be": "lrtpu_f32_to_s32s",
    "f32le": "lrtpu_f32_to_f32", "f32be": "lrtpu_f32_to_f32s",
    "f64le": "lrtpu_f32_to_f64", "f64be": "lrtpu_f32_to_f64s",
}

# byte-swapped formats are stored via their native-endian ctypes width
_RAW_DTYPES = {
    "u8": "u1", "s8": "i1", "u16le": "<u2", "u16be": ">u2", "s16le": "<i2",
    "s16be": ">i2", "u32le": "<u4", "u32be": ">u4", "s32le": "<i4",
    "s32be": ">i4", "f32le": "<f4", "f32be": ">f4", "f64le": "<f8",
    "f64be": ">f8",
}

LIB = _load()


def available() -> bool:
    return LIB is not None


def raw_bytes_to_f32(buf: bytes, fmt_name: str, offset: float,
                     scale: float) -> np.ndarray:
    """Native raw->float32 conversion of a byte buffer of scalar samples."""
    item = np.dtype(_RAW_DTYPES[fmt_name]).itemsize
    n = len(buf) // item
    out = np.empty(n, dtype=np.float32)
    fn = getattr(LIB, _TO_F32[fmt_name])
    fn(buf, out.ctypes.data_as(ctypes.c_void_p), ctypes.c_size_t(n),
       ctypes.c_double(offset), ctypes.c_double(1.0 / scale))
    return out


def f32_to_raw_bytes(x: np.ndarray, fmt_name: str, offset: float,
                     scale: float) -> bytes:
    """Native float32->raw conversion returning wire bytes."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    n = len(x)
    item = np.dtype(_RAW_DTYPES[fmt_name]).itemsize
    out = np.empty(n * item, dtype=np.uint8)
    fn = getattr(LIB, _FROM_F32[fmt_name])
    fn(x.ctypes.data_as(ctypes.c_void_p),
       out.ctypes.data_as(ctypes.c_void_p), ctypes.c_size_t(n),
       ctypes.c_double(offset), ctypes.c_double(scale))
    return out.tobytes()


__all__ = ["available", "raw_bytes_to_f32", "f32_to_raw_bytes", "LIB"]
