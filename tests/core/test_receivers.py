"""End-to-end receiver integration tests: synthesize a modulated RF capture
with numpy, run the full receiver composite through the runtime, and check
the decoded frames/messages.

These are the TPU analog of the reference's example-level validation — they
exercise the fused device chain, the masked Sampler boundary, dual-block
demotion, and the host framers in one graph.
"""

import numpy as np
import pytest

import luaradio_tpu as radio
from luaradio_tpu.blocks.protocol.pocsag import POCSAG_FRAME_SYNC_CODEWORD, \
    POCSAG_IDLE_CODEWORD
from luaradio_tpu.core.block import HostSourceBlock, Input, Output
from luaradio_tpu.core.composite import CompositeBlock
from luaradio_tpu.types import ComplexFloat32

from tests.blocks.test_protocol import pocsag_encode_codeword, rds_encode_group

RNG = np.random.default_rng(99)


class ArraySource(HostSourceBlock):
    def __init__(self, data, rate):
        super().__init__()
        self.rate = rate
        self._data = np.asarray(data)
        self._pos = 0
        self.add_type_signature([], [Output("out", ComplexFloat32)])

    def read(self, n):
        if self._pos >= len(self._data):
            return None
        chunk = self._data[self._pos:self._pos + n]
        self._pos += len(chunk)
        return chunk


class CollectSink(radio.SinkBlock):
    def __init__(self):
        super().__init__()
        self.items = []
        self.add_type_signature([Input("in", lambda t: True)], [])

    def process(self, x):
        if isinstance(x, (list, tuple)):
            self.items.extend(x)
        else:
            self.items.extend(np.asarray(x).reshape(-1).tolist())


def fm_modulate(msg: np.ndarray, k: float) -> np.ndarray:
    phi = 2 * np.pi * k * np.cumsum(msg.astype(np.float64))
    return np.exp(1j * phi).astype(np.complex64)


def manchester_diff_encode(bits: np.ndarray) -> np.ndarray:
    """Differential-encode then Manchester-encode (1 -> 10, 0 -> 01),
    matching the RDS receiver's Manchester + differential decode order."""
    diff = np.zeros(len(bits), dtype=np.uint8)
    prev = 0
    for i, b in enumerate(bits):
        prev = prev ^ b
        diff[i] = prev
    mane = np.zeros(2 * len(bits), dtype=np.uint8)
    mane[0::2] = diff
    mane[1::2] = 1 - diff
    return mane


def test_rds_receiver_end_to_end():
    """Synthesize an FM-MPX baseband with 19 kHz pilot + 57 kHz BPSK RDS
    sidebands, FM-modulate it, and decode RDS groups with the full
    receiver."""
    rate = 228000.0  # 12 x 19 kHz
    groups = [tuple(int(v) for v in RNG.integers(0, 1 << 16, 4))
              for _ in range(6)]
    bits = np.concatenate([rds_encode_group(g) for g in groups])
    chips = manchester_diff_encode(bits)  # 2375 chips/s

    chip_rate = 1187.5 * 2
    sps = rate / chip_rate  # 96 samples per chip
    n = int(len(chips) * sps) + int(rate * 0.05)
    t = np.arange(n) / rate
    chip_idx = np.minimum((t * chip_rate).astype(int), len(chips) - 1)
    bpsk = 2.0 * chips[chip_idx] - 1.0

    pilot = np.cos(2 * np.pi * 19e3 * t)
    carrier57 = np.cos(3 * 2 * np.pi * 19e3 * t)
    audio = 0.2 * np.sin(2 * np.pi * 800.0 * t)
    mpx = audio + 0.1 * pilot + 0.06 * bpsk * carrier57

    iq = fm_modulate(mpx, 1.0)

    top = CompositeBlock()
    src = ArraySource(iq, rate)
    rx = radio.RDSReceiver()
    sink = CollectSink()
    top.connect(src, rx, sink)
    top.run(chunk_size=1 << 17)

    # random groups mostly decode as "raw" packets carrying the block words;
    # a group whose random group code hits 0/2/4 decodes as a typed packet,
    # so compare on the raw ones only
    raw_found = [tuple(p.data["frame"]) for p in sink.items
                 if p.data.get("type") == "raw"]
    recovered = [g for g in groups if g in raw_found]
    # at least half the groups must come through (PLL/clock sync transient
    # can eat the first one; typed packets are excluded from the comparison)
    assert len(sink.items) >= 4
    assert len(recovered) >= 3, (groups, raw_found)


def make_pocsag_iq():
    """Synthesized 2-FSK POCSAG capture: returns (iq, rate, baud,
    address, func, text)."""
    rate = 38400.0
    baud = 1200
    address, func = 0x12342, 2

    # message "HI" alphanumeric
    text_bits = []
    for ch in "HI" + chr(0x17):
        text_bits.extend((ord(ch) >> i) & 1 for i in range(7))
    while len(text_bits) % 20:
        text_bits.append(1)
    words = [int("".join(map(str, text_bits[i:i + 20])), 2)
             for i in range(0, len(text_bits), 20)]

    batch = []
    placed = False
    data_left = list(words)
    for j in range(16):
        if not placed and (j >> 1) == (address & 0x7):
            batch.append(pocsag_encode_codeword(((address >> 3) << 2) | func))
            placed = True
        elif placed and data_left:
            batch.append(pocsag_encode_codeword((1 << 20) | data_left.pop(0)))
        else:
            batch.append(POCSAG_IDLE_CODEWORD)

    bit_stream = [np.asarray([1, 0] * 288, dtype=np.uint8)]  # preamble
    for sync_batch in (batch, [POCSAG_IDLE_CODEWORD] * 16):
        bit_stream.append(radio.types.number_to_bits(
            POCSAG_FRAME_SYNC_CODEWORD, 32))
        for cw in sync_batch:
            bit_stream.append(radio.types.number_to_bits(cw, 32))
    bits = np.concatenate(bit_stream)

    # 2-FSK: bit 1 -> -4.5 kHz (mark), bit 0 -> +4.5 kHz (space)
    sps = int(rate / baud)
    freqs = np.where(np.repeat(bits, sps) == 1, -4500.0, 4500.0)
    phi = 2 * np.pi * np.cumsum(freqs) / rate
    iq = np.exp(1j * phi).astype(np.complex64)
    iq = np.concatenate([iq, np.zeros(4096, dtype=np.complex64)])
    return iq, rate, baud, address, func, "HI"


def test_pocsag_receiver_end_to_end():
    """Synthesize 2-FSK POCSAG at 4.5 kHz deviation and decode a message
    with the full receiver."""
    iq, rate, baud, address, func, text = make_pocsag_iq()
    top = CompositeBlock()
    src = ArraySource(iq, rate)
    rx = radio.POCSAGReceiver(baud)
    sink = CollectSink()
    top.connect(src, rx, sink)
    top.run(chunk_size=1 << 15)

    assert len(sink.items) >= 1, "no POCSAG messages decoded"
    msg = sink.items[0]
    assert msg.address == address
    assert msg.func == func
    assert msg.alphanumeric == "HI"


def make_scm_iq():
    """Synthesized OOK Manchester SCM burst: returns (iq, rate, ert_id,
    consumption)."""
    from luaradio_tpu.blocks.protocol.ert import _scm_code
    from luaradio_tpu.types import number_to_bits

    rate = 2359296.0  # 36 * 65536: integer samples per chip at every stage
    ert_id = 0x1C0FFEE
    consumption = 424242
    msg = np.concatenate([
        number_to_bits(ert_id >> 24, 2),
        number_to_bits(0, 1),            # reserved
        number_to_bits(2, 2),            # physical tamper
        number_to_bits(4, 4),            # ert type
        number_to_bits(1, 2),            # encoder tamper
        number_to_bits(consumption, 24),
        number_to_bits(ert_id & 0xFFFFFF, 24)])
    crc = 0
    for i in np.flatnonzero(msg):
        crc ^= _scm_code.syndromes[int(i)]
    frame_bits = np.concatenate([
        radio.SCMFramerBlock.SCM_PREAMBLE, msg, number_to_bits(crc, 16)])
    assert len(frame_bits) == 96

    # Manchester OOK: bit b -> chips (b, 1-b) at 2*16384 = 32768 chips/s
    chips = np.zeros(2 * len(frame_bits), dtype=np.float64)
    chips[0::2] = frame_bits
    chips[1::2] = 1 - frame_bits
    sps_chip = int(rate / 32768)  # 72
    ook = np.repeat(chips, sps_chip)
    lead = np.zeros(40000)
    tail = np.zeros(60000)
    envelope = np.concatenate([lead, ook, tail])
    iq = (envelope * np.exp(1j * 2 * np.pi * 0.11 *
                            np.arange(len(envelope)))).astype(np.complex64)
    return iq, rate, ert_id, consumption


def test_ert_scm_receiver_end_to_end():
    """Synthesize an OOK Manchester SCM burst (32768 chips/s) and decode it
    with the full ERTReceiver chain."""
    iq, rate, ert_id, consumption = make_scm_iq()
    top = CompositeBlock()
    src = ArraySource(iq, rate)
    rx = radio.ERTReceiver(("scm",))
    sink = CollectSink()
    top.connect(src, "out", rx, "in")
    top.connect(rx, "out1", sink, "in")
    top.run(chunk_size=1 << 17)

    assert len(sink.items) >= 1, "no SCM frames decoded"
    frame = sink.items[0]
    assert frame.ert_id == ert_id
    assert frame.consumption == consumption
    assert frame.ert_type == 4


def make_bpsk31_iq():
    """Synthesized differential BPSK31 capture: returns (iq, rate, text)."""
    from luaradio_tpu.blocks.protocol.varicode import VARICODE

    rate = 8000.0
    text = "cq cq de tpu"
    bits = [0] * 32  # idle: continuous phase reversals (zeros)
    for ch in text:
        bits.extend(int(c) for c in VARICODE[ord(ch)])
        bits.extend([0, 0])
    bits.extend([0] * 32)

    # differential encode: 0 -> reverse phase, 1 -> keep
    phases = np.zeros(len(bits))
    cur = 1.0
    sym = []
    for b in bits:
        if b == 0:
            cur = -cur
        sym.append(cur)
    sps = int(rate / 31.25)  # 256
    bb = np.repeat(sym, sps)
    # gentle raised-cosine shaping at symbol edges is not required for a
    # clean synthetic; feed rectangular BPSK at baseband
    iq = (bb + 0j).astype(np.complex64)
    iq = np.concatenate([iq, np.zeros(8192, np.complex64)])
    return iq, rate, text


def test_bpsk31_receiver_end_to_end():
    """Synthesize differential BPSK31 (31.25 baud, 0 = phase reversal) and
    decode text with the full receiver."""
    iq, rate, text = make_bpsk31_iq()
    top = CompositeBlock()
    src = ArraySource(iq, rate)
    rx = radio.BPSK31Receiver()
    sink = CollectSink()
    top.connect(src, rx, sink)
    top.run(chunk_size=1 << 15)

    decoded = bytes(int(v) for v in sink.items).decode(errors="replace")
    assert text in decoded, decoded


def make_ax25_iq():
    """Synthesized Bell-202 AFSK AX.25 capture: returns (iq, rate)."""
    from tests.blocks.test_protocol import ax25_encode, hdlc_stuff

    rate = 48000.0
    frame_bits = ax25_encode([("NOCALL", 0x60), ("TPU", 0x61)],
                             0x03, 0xF0, b"hello from tpu radio")
    flag = np.asarray([0, 1, 1, 1, 1, 1, 1, 0], dtype=np.uint8)
    stream = np.concatenate([np.tile(flag, 30), hdlc_stuff(frame_bits),
                             np.tile(flag, 30)])

    # NRZI: 1 -> no transition, 0 -> transition
    nrzi = np.zeros(len(stream), dtype=np.int8)
    cur = 0
    for i, b in enumerate(stream):
        if b == 0:
            cur ^= 1
        nrzi[i] = cur

    # AFSK: NRZI level 0 -> 1200 Hz (mark), 1 -> 2200 Hz (space)
    sps = int(rate / 1200)  # 40
    tone = np.where(np.repeat(nrzi, sps) == 0, 1200.0, 2200.0)
    audio_phi = 2 * np.pi * np.cumsum(tone) / rate
    audio = np.sin(audio_phi)
    # FM modulate at 3 kHz deviation
    phi = 2 * np.pi * 3e3 * np.cumsum(audio) / rate
    iq = np.exp(1j * phi).astype(np.complex64)
    iq = np.concatenate([iq, np.zeros(16384, np.complex64)])
    return iq, rate


def test_ax25_receiver_end_to_end():
    """Synthesize Bell-202 AFSK (1200 baud, NRZI, HDLC) and decode an AX.25
    frame with the full receiver."""
    iq, rate = make_ax25_iq()
    top = CompositeBlock()
    src = ArraySource(iq, rate)
    rx = radio.AX25Receiver()
    sink = CollectSink()
    top.connect(src, rx, sink)
    top.run(chunk_size=1 << 15)

    assert len(sink.items) >= 1, "no AX.25 frames decoded"
    f = sink.items[0]
    assert f.addresses[0]["callsign"] == "NOCALL"
    assert f.payload == "hello from tpu radio"
