"""Network sources.

TPU-native equivalents of /root/reference/radio/blocks/sources/
{networkclient,networkserver}.lua: complex/real samples in any of the 14
scalar wire formats, native ("raw") samples, or newline-delimited JSON
objects, over TCP or UNIX sockets.
"""

from __future__ import annotations

import json as _json

import numpy as np

from luaradio_tpu.core.block import HostSourceBlock, Output
from luaradio_tpu.types import (ComplexFloat32, Float32, SampleType,
                                object_type)
from luaradio_tpu.utils import format as format_utils
from luaradio_tpu.utils.network import NetworkClient, NetworkServer


class _NetworkSourceBase(HostSourceBlock):
    def __init__(self, data_type: SampleType, rate: float, transport: str,
                 address: str, format: str | None = "f32le",
                 reconnect: bool = True):
        super().__init__()
        self.data_type = data_type
        self.rate = rate
        self.transport = transport
        self.address = address
        self.reconnect = reconnect
        self._residue = b""
        if format in ("raw", "json", "msgpack", None):
            self.format = None
            self.mode = format or "raw"
        else:
            self.format = format_utils.get_format(format)
            self.mode = "format"
            if data_type not in (ComplexFloat32, Float32):
                raise ValueError("formatted network sources require "
                                 "ComplexFloat32 or Float32")
        self.add_type_signature([], [Output("out", data_type)])

    # -- endpoint management (client/server subclasses) --------------------
    def _ensure_connected(self):
        raise NotImplementedError

    def _endpoint(self):
        raise NotImplementedError

    def _item_bytes(self) -> int:
        if self.mode == "format":
            mult = 2 if self.data_type == ComplexFloat32 else 1
            return self.format.itemsize * mult
        if self.mode == "raw":
            return self.data_type.dtype.itemsize
        return 1  # json/msgpack: byte stream

    def read(self, n: int):
        self._ensure_connected()
        item = self._item_bytes()
        want = max(item, min(n * item, 1 << 18))
        while True:
            data = self._endpoint().recv(want)
            if data:
                break
            # disconnected
            if not self.reconnect:
                return None
            self._reconnect()
        buf = self._residue + data
        if self.mode == "json":
            lines = buf.split(b"\n")
            self._residue = lines[-1]
            out = [_json.loads(ln) for ln in lines[:-1] if ln.strip()]
            return out if out else np.zeros(0, dtype=object)
        if self.mode == "msgpack":
            # framed objects: u32-BE length + MessagePack payload
            # (reference object.lua:106-201 wire format)
            from luaradio_tpu.utils.msgpack import deserialize_framed
            out, pos = [], 0
            while True:
                obj, pos2 = deserialize_framed(buf, pos)
                if pos2 == pos:
                    break
                out.append(obj)
                pos = pos2
            self._residue = buf[pos:]
            return out if out else np.zeros(0, dtype=object)
        count = len(buf) // item
        self._residue = buf[count * item:]
        chunk = buf[:count * item]
        if self.mode == "raw":
            return np.frombuffer(chunk, dtype=self.data_type.dtype)
        if self.data_type == ComplexFloat32:
            return format_utils.bytes_to_complex(chunk, self.format)
        return format_utils.bytes_to_real(chunk, self.format)


class NetworkClientSource(_NetworkSourceBase):
    """Source samples from a remote server (reference: networkclient.lua)."""

    def initialize(self):
        self.client = NetworkClient(self.transport, self.address)

    def _ensure_connected(self):
        if not self.client.connected():
            self.client.connect_blocking()

    def _reconnect(self):
        self.client.close()
        self.client.connect_blocking()

    def _endpoint(self):
        return self.client

    def cleanup(self):
        if getattr(self, "client", None):
            self.client.close()


class NetworkServerSource(_NetworkSourceBase):
    """Source samples from an accepted client (reference: networkserver.lua)."""

    def initialize(self):
        self.server = NetworkServer(self.transport, self.address)
        self.server.listen()

    def _ensure_connected(self):
        if not self.server.connected():
            self.server.accept()

    def _reconnect(self):
        self.server.sock = None
        self.server.accept()

    def _endpoint(self):
        return self.server

    def cleanup(self):
        if getattr(self, "server", None):
            self.server.close()


__all__ = ["NetworkClientSource", "NetworkServerSource"]
