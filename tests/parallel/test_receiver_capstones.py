"""Time-sharded capstones for every protocol receiver (VERDICT r3 item 7):
AX25, POCSAG, ERT(SCM), and BPSK31 — each full generic receiver decodes a
synthesized RF capture identically while its single stream is time-sharded
over a ("time",) mesh, completing the set started by the RDS capstone
(test_time_runner.py).  The reference analog is one scheduler serving
every graph equally (composite.lua:514-950)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

import luaradio_tpu as radio
from luaradio_tpu.core.composite import CompositeBlock
from luaradio_tpu.core.runtime import Runner

from tests.core.test_receivers import (ArraySource, CollectSink,
                                       make_ax25_iq, make_bpsk31_iq,
                                       make_pocsag_iq, make_scm_iq)


def _mesh(n):
    return Mesh(np.array(jax.devices("cpu")[:n]), ("time",))


def _decode(build, mesh, chunk):
    top, sink = build()
    Runner(top, mode="fused", chunk_size=chunk, mesh=mesh).run()
    return sink


def test_ax25_receiver_time_sharded():
    iq, rate = make_ax25_iq()

    def build():
        top = CompositeBlock()
        sink = CollectSink()
        top.connect(ArraySource(iq, rate), radio.AX25Receiver(), sink)
        return top, sink

    serial = _decode(build, None, 1 << 15)
    sharded = _decode(build, _mesh(4), 1 << 15)
    assert len(serial.items) >= 1
    assert [str(f) for f in sharded.items] == [str(f) for f in serial.items]
    assert sharded.items[0].addresses[0]["callsign"] == "NOCALL"
    assert sharded.items[0].payload == "hello from tpu radio"


def test_pocsag_receiver_time_sharded():
    iq, rate, baud, address, func, text = make_pocsag_iq()

    def build():
        top = CompositeBlock()
        sink = CollectSink()
        top.connect(ArraySource(iq, rate), radio.POCSAGReceiver(baud), sink)
        return top, sink

    serial = _decode(build, None, 1 << 15)
    sharded = _decode(build, _mesh(4), 1 << 15)
    assert len(serial.items) >= 1
    assert [str(m) for m in sharded.items] == [str(m) for m in serial.items]
    msg = sharded.items[0]
    assert (msg.address, msg.func, msg.alphanumeric) == (address, func, text)


def test_ert_scm_receiver_time_sharded():
    iq, rate, ert_id, consumption = make_scm_iq()

    def build():
        top = CompositeBlock()
        sink = CollectSink()
        rx = radio.ERTReceiver(("scm",))
        top.connect(ArraySource(iq, rate), "out", rx, "in")
        top.connect(rx, "out1", sink, "in")
        return top, sink

    serial = _decode(build, None, 1 << 17)
    sharded = _decode(build, _mesh(4), 1 << 17)
    assert len(serial.items) >= 1
    assert [str(f) for f in sharded.items] == [str(f) for f in serial.items]
    frame = sharded.items[0]
    assert (frame.ert_id, frame.consumption) == (ert_id, consumption)


def test_bpsk31_receiver_time_sharded():
    iq, rate, text = make_bpsk31_iq()

    def build():
        top = CompositeBlock()
        sink = CollectSink()
        top.connect(ArraySource(iq, rate), radio.BPSK31Receiver(), sink)
        return top, sink

    serial = _decode(build, None, 1 << 15)
    sharded = _decode(build, _mesh(4), 1 << 15)
    dec_serial = bytes(int(v) for v in serial.items).decode(errors="replace")
    dec_sharded = bytes(int(v) for v in sharded.items).decode(errors="replace")
    assert text in dec_serial
    assert dec_sharded == dec_serial


def test_combined_channel_time_receiver():
    """One receiver under a combined ("channel", "time") mesh: a 2-channel
    POCSAG bank, each channel's time axis sharded 2-way, decodes both
    channels identically to serial."""
    from luaradio_tpu.blocks.sources.bank import BankSource

    iq, rate, baud, address, func, text = make_pocsag_iq()

    class BankArrays(BankSource):
        pass

    def chan_sources():
        return [ArraySource(iq, rate), ArraySource(iq * np.complex64(1.0),
                                                   rate)]

    # serial reference (single channel)
    top = CompositeBlock()
    s_sink = CollectSink()
    top.connect(ArraySource(iq, rate), radio.POCSAGReceiver(baud), s_sink)
    Runner(top, mode="fused", chunk_size=1 << 14).run()
    assert len(s_sink.items) >= 1

    sink = CollectSink()
    top = CompositeBlock()
    top.connect(BankArrays(chan_sources()), radio.POCSAGReceiver(baud), sink)
    r = Runner(top, mode="fused", chunk_size=1 << 14,
               mesh=Mesh(np.array(jax.devices("cpu")[:4]).reshape(2, 2),
                         ("channel", "time")), channels=2)
    r.run()
    # banked host fan-out: messages alternate channels; both channels must
    # decode the serial message
    got = [str(m) for m in sink.items]
    assert got.count(str(s_sink.items[0])) >= 2, got
