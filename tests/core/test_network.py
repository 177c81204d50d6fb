"""Network source/sink loopback tests (analog of
/root/reference/tests/network_spec.lua): client/server over real TCP and
UNIX sockets for formatted, raw, and JSON wire formats."""

import os
import tempfile
import threading

import numpy as np
import pytest

from luaradio_tpu import (NetworkClientSink, NetworkClientSource,
                          NetworkServerSink, NetworkServerSource)
from luaradio_tpu.types import ComplexFloat32, Float32
from tests.jig import prepare_block

RNG = np.random.default_rng(31)


def _free_port():
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("transport", ["tcp", "unix"])
@pytest.mark.parametrize("fmt", ["f32le", "s16be", "raw"])
def test_server_sink_client_source_roundtrip(transport, fmt, tmp_path):
    if transport == "tcp":
        address = f"127.0.0.1:{_free_port()}"
    else:
        address = str(tmp_path / "sock")
    n = 5000
    x = (RNG.uniform(-0.9, 0.9, n) + 1j * RNG.uniform(-0.9, 0.9, n)
         ).astype(np.complex64)

    sink = NetworkServerSink(transport, address, format=fmt)
    sink.differentiate([ComplexFloat32])
    sink.input_rate = 1e6
    sink.initialize()

    src = prepare_block(
        NetworkClientSource(ComplexFloat32, 1e6, transport, address,
                            format=fmt, reconnect=False), [])

    def serve():
        sink._ensure_connected()
        sink.process(x)
        sink.cleanup()

    t = threading.Thread(target=serve)
    t.start()
    got = []
    try:
        while sum(map(len, got)) < n:
            chunk = src.read(4096)
            if chunk is None:
                break
            got.append(chunk)
    finally:
        t.join()
        src.cleanup()
    got = np.concatenate(got)
    assert len(got) == n
    eps = 1e-4 if fmt != "s16be" else 1e-4
    assert np.max(np.abs(got - x)) < eps


def test_client_sink_server_source_json(tmp_path):
    address = str(tmp_path / "jsock")
    objs = [{"id": i, "value": f"msg{i}"} for i in range(20)]

    src = prepare_block(
        NetworkServerSource(ComplexFloat32, 1e3, "unix", address,
                            format="json", reconnect=False), [])

    sink = NetworkClientSink("unix", address, format="json")
    sink.differentiate([ComplexFloat32])
    sink.initialize()

    def send():
        sink._ensure_connected()
        sink.process(objs)
        sink.cleanup()

    t = threading.Thread(target=send)
    t.start()
    got = []
    try:
        while len(got) < len(objs):
            chunk = src.read(100)
            if chunk is None:
                break
            got.extend(chunk)
    finally:
        t.join()
        src.cleanup()
    assert got == objs
