"""MessagePack codec + framed object wire format (parity with the
reference's ObjectType pipe serialization, object.lua:106-201)."""

import dataclasses
import struct

import numpy as np
import pytest

from luaradio_tpu.utils.msgpack import (deserialize_framed, packb,
                                        serialize_framed, unpackb)


@pytest.mark.parametrize("obj", [
    None, True, False,
    0, 1, 127, 128, 255, 256, 65535, 65536, 2**32 - 1, 2**32, 2**63 - 1,
    -1, -32, -33, -128, -129, -32768, -32769, -2**31, -2**31 - 1, -2**63,
    3.14159, -2.5e300, 0.0,
    "", "hello", "x" * 31, "x" * 32, "y" * 300, "z" * 70000, "ünïcødé",
    b"", b"bytes", b"q" * 300, b"w" * 70000,
    [], [1, 2, 3], list(range(20)), list(range(70000)),
    {}, {"a": 1, "b": [2, 3]}, {str(i): i for i in range(20)},
    {"nested": {"deep": [1, {"x": None}]}},
])
def test_roundtrip(obj):
    got = unpackb(packb(obj))
    assert got == obj


def test_spec_encodings():
    """Spot-check exact byte encodings against the public spec."""
    assert packb(None) == b"\xc0"
    assert packb(True) == b"\xc3"
    assert packb(5) == b"\x05"
    assert packb(-1) == b"\xff"
    assert packb(200) == b"\xcc\xc8"
    assert packb("abc") == b"\xa3abc"
    assert packb([1, 2]) == b"\x92\x01\x02"
    assert packb({"a": 1}) == b"\x81\xa1a\x01"
    assert packb(1.0) == b"\xcb" + struct.pack(">d", 1.0)


def test_float32_decode():
    buf = b"\xca" + struct.pack(">f", 2.5)
    assert unpackb(buf) == 2.5


def test_dataclass_packs_as_map():
    @dataclasses.dataclass
    class Frame:
        addr: int
        payload: bytes

    got = unpackb(packb(Frame(7, b"hi")))
    assert got == {"addr": 7, "payload": b"hi"}


def test_numpy_scalars_and_arrays():
    assert unpackb(packb(np.float32(1.5))) == 1.5
    assert unpackb(packb(np.uint8(7))) == 7
    assert unpackb(packb(np.array([1, 2, 3]))) == [1, 2, 3]


def test_framed_stream():
    objs = [{"seq": i, "data": "x" * i} for i in range(5)]
    wire = b"".join(serialize_framed(o) for o in objs)
    # whole frames parse out; a partial tail does not
    got, pos = [], 0
    while True:
        o, pos2 = deserialize_framed(wire, pos)
        if pos2 == pos:
            break
        got.append(o)
        pos = pos2
    assert got == objs
    assert pos == len(wire)
    # truncated frame: incomplete
    o, pos2 = deserialize_framed(wire[:len(wire) - 3], 0)
    assert o is not None  # first frame is whole
    o, p = deserialize_framed(wire[:2])
    assert o is None and p == 0


def test_object_type_serialize_contract():
    from luaradio_tpu.types import ObjectSampleType

    @dataclasses.dataclass
    class Packet:
        kind: str
        value: int

    t = ObjectSampleType("PacketType", factory=Packet)
    wire = t.serialize(Packet("scm", 42)) + t.serialize(Packet("idm", 7))
    assert t.deserialize_count(wire) == 2
    obj, pos = t.deserialize(wire)
    assert obj == Packet("scm", 42)
    obj2, pos = t.deserialize(wire, pos)
    assert obj2 == Packet("idm", 7)
    assert pos == len(wire)


def test_network_msgpack_loopback():
    """Object samples over a real TCP socket in the msgpack wire format."""
    import threading
    import luaradio_tpu as lr
    from luaradio_tpu.core.composite import CompositeBlock
    from tests.core.test_receivers import CollectSink
    from luaradio_tpu.core.block import HostSourceBlock, Output
    from luaradio_tpu.types import object_type

    objs = [{"id": i, "name": f"pkt{i}"} for i in range(10)]

    class ObjSource(HostSourceBlock):
        def __init__(self):
            super().__init__()
            self.rate = 100.0
            self.sent = False
            self.add_type_signature([], [Output("out",
                                                object_type("Obj"))])

        def read(self, n):
            if self.sent:
                return None
            self.sent = True
            return list(objs)

    addr = "127.0.0.1:28471"

    def serve():
        top = CompositeBlock()
        top.connect(ObjSource(),
                    lr.NetworkServerSink("tcp", addr, format="msgpack"))
        top.run(chunk_size=64)

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    top2 = CompositeBlock()
    sink = CollectSink()
    src = lr.NetworkClientSource(object_type("Obj"), 100.0, "tcp", addr,
                                 format="msgpack", reconnect=False)
    top2.connect(src, sink)
    top2.run(chunk_size=64)
    t.join(timeout=5)
    assert sink.items == objs
