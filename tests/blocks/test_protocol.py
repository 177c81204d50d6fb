"""Protocol framer/decoder golden tests.

Each test builds valid frames with a local *encoder* (CRC/BCH generation
from the public standards), embeds them in a noisy bit stream, optionally
injects correctable bit errors, and checks the framers recover them —
mirroring the reference's generated protocol specs
(/root/reference/tests/blocks/protocol/*_spec.py).
"""

import numpy as np
import pytest

from luaradio_tpu.blocks.protocol.ax25 import (AX25Frame, AX25FramerBlock,
                                               _crc16_x25)
from luaradio_tpu.blocks.protocol.ert import (IDMFramerBlock, SCMFramerBlock,
                                              SCMPlusFramerBlock,
                                              _crc16_ccitt_bits, _idm_code,
                                              _scm_code, _scm_plus_code)
from luaradio_tpu.blocks.protocol.pocsag import (POCSAGDecoderBlock,
                                                 POCSAGFramerBlock,
                                                 POCSAG_FRAME_SYNC_CODEWORD,
                                                 POCSAG_IDLE_CODEWORD,
                                                 _bch_mod)
from luaradio_tpu.blocks.protocol.rds import (RDSDecoderBlock, RDSFrame,
                                              RDSFramerBlock,
                                              RDS_OFFSET_WORDS, _poly_mod)
from luaradio_tpu.blocks.protocol.varicode import (VARICODE,
                                                   VaricodeDecoderBlock)
from luaradio_tpu.types import Bit, number_to_bits
from tests.jig import prepare_block, run_block

RNG = np.random.default_rng(17)


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def rds_encode_group(blocks4):
    """Four 16-bit data words -> 104 bits with check words."""
    bits = []
    for name, data in zip(("A", "B", "C", "D"), blocks4):
        crc = _poly_mod(data << 10, 26)
        block = (data << 10) | (crc ^ RDS_OFFSET_WORDS[name])
        bits.append(number_to_bits(block, 26))
    return np.concatenate(bits)


def pocsag_encode_codeword(msg21: int) -> int:
    w31 = (msg21 << 10) | _bch_mod(msg21 << 10, 31)
    parity = bin(w31).count("1") & 1
    return (w31 << 1) | parity


def scm_encode(frame_bits59: np.ndarray) -> np.ndarray:
    crc = 0
    for i in np.flatnonzero(frame_bits59):
        crc ^= _scm_code.syndromes[int(i)]
    return np.concatenate([frame_bits59, number_to_bits(crc, 16)])


def ax25_encode(addresses, control, pid, payload: bytes) -> np.ndarray:
    """Build an unstuffed AX.25 bit frame (LSB-first bytes) + FCS."""
    raw_bytes = []
    for i, (callsign, ssid) in enumerate(addresses):
        for ch in callsign.ljust(6):
            raw_bytes.append(ord(ch) << 1)
        last = 1 if i == len(addresses) - 1 else 0
        raw_bytes.append((ssid << 1) | last)
    raw_bytes.append(control)
    raw_bytes.append(pid)
    raw_bytes.extend(payload)
    bits = []
    for byte in raw_bytes:
        bits.extend((byte >> i) & 1 for i in range(8))
    bits = np.asarray(bits, dtype=np.uint8)
    fcs = _crc16_x25(bits)
    fcs_bits = np.asarray([(fcs >> i) & 1 for i in range(16)], dtype=np.uint8)
    return np.concatenate([bits, fcs_bits])


def hdlc_stuff(bits: np.ndarray) -> np.ndarray:
    out = []
    ones = 0
    for b in bits:
        out.append(int(b))
        ones = ones + 1 if b else 0
        if ones == 5:
            out.append(0)
            ones = 0
    return np.asarray(out, dtype=np.uint8)


# ---------------------------------------------------------------------------
# RDS
# ---------------------------------------------------------------------------

def test_rds_framer_with_noise_and_bit_errors():
    groups = [tuple(int(v) for v in RNG.integers(0, 1 << 16, 4))
              for _ in range(4)]
    stream = [np.asarray(RNG.integers(0, 2, 37), dtype=np.uint8)]
    for g in groups:
        stream.append(rds_encode_group(g))
    bits = np.concatenate(stream)
    # inject a correctable single-bit error into the second group
    bits[37 + 104 + 50] ^= 1
    blk = prepare_block(RDSFramerBlock(), [Bit])
    frames = run_block(blk, [bits], splits=(100, 150, 300))[0]
    assert [f.blocks for f in frames] == groups


def test_rds_decoder_packets():
    dec = prepare_block(RDSDecoderBlock(), [RDSFramerBlock.RDSFrameType])
    # group 0A basic tuning: text "AB" at address 2
    b1 = (0 << 12) | (0 << 11) | (1 << 10) | (7 << 5) | (1 << 4) | 2
    frame0 = RDSFrame((0x1234, b1, 0xE0F1, (ord("A") << 8) | ord("B")))
    # group 2A radiotext: "WXYZ" at address 3
    b1_rt = (2 << 12) | (0 << 11) | 3
    frame2 = RDSFrame((0x1234, b1_rt, (ord("W") << 8) | ord("X"),
                       (ord("Y") << 8) | ord("Z")))
    # group 4A datetime: 2016-04-05 01:02 +0.0h  (MJD 57483)
    mjd = 57483
    b1_dt = (4 << 12) | (0 << 11)
    b2 = ((mjd & 0x7FFF) << 1) | 0  # hour MSB 0
    b3 = (1 << 12) | (2 << 6) | 0
    frame4 = RDSFrame(((mjd >> 15) & 0x3 and 0x1234 or 0x1234,
                       b1_dt | ((mjd >> 15) & 0x3), b2, b3))
    pkts = dec.process([frame0, frame2, frame4])
    assert pkts[0].data["type"] == "basictuning"
    assert pkts[0].data["text_data"] == "AB"
    assert pkts[0].data["text_address"] == 2
    assert pkts[0].header["pty_code"] == 7
    assert pkts[1].data["type"] == "radiotext"
    assert pkts[1].data["text_data"] == "WXYZ"
    assert pkts[2].data["type"] == "datetime"
    assert pkts[2].data["date"] == {"year": 2016, "month": 4, "day": 5}
    assert pkts[2].data["time"]["hour"] == 1
    assert pkts[2].data["time"]["minute"] == 2


# ---------------------------------------------------------------------------
# POCSAG
# ---------------------------------------------------------------------------

def _pocsag_address_codeword(address: int, func: int, batch_pos: int) -> int:
    msg = ((address >> 3) << 2) | func
    return pocsag_encode_codeword(msg)


def test_pocsag_receiver_message():
    # "HI" alphanumeric message to address 0x12345 (batch position frame 2)
    address = (0x12340 | 2 << 0)  # LSB 3 bits come from batch position
    address = 0x12342
    frame_idx = (address & 0x7)  # batch frame position = addr LSBs
    # two 20-bit data words carrying 7-bit chars 'H','I', EOT, padding 1s
    text_bits = []
    for ch in "HI" + chr(0x17):
        text_bits.extend((ord(ch) >> i) & 1 for i in range(7))
    while len(text_bits) % 20:
        text_bits.append(1)
    words = [int("".join(map(str, text_bits[i:i + 20])), 2)
             for i in range(0, len(text_bits), 20)]

    codewords = []
    for j in range(16):
        if j // 2 == frame_idx >> 0 and j % 2 == 0 and j // 2 == (address & 0x7):
            pass
    # place address codeword at batch frame = address LSB 3 bits
    batch = []
    placed = False
    data_left = list(words)
    for j in range(16):
        if not placed and (j >> 1) == (address & 0x7):
            msg = ((address >> 3) << 2) | 0x2  # func = 2
            batch.append(pocsag_encode_codeword(msg))
            placed = True
        elif placed and data_left:
            w = data_left.pop(0)
            batch.append(pocsag_encode_codeword((1 << 20) | w))
        else:
            batch.append(POCSAG_IDLE_CODEWORD)
    assert placed

    bits = [np.asarray(RNG.integers(0, 2, 23), dtype=np.uint8),
            number_to_bits(POCSAG_FRAME_SYNC_CODEWORD, 32)]
    for cw in batch:
        bits.append(number_to_bits(cw, 32))
    # second batch: sync + all idle (flushes the pending frame)
    bits.append(number_to_bits(POCSAG_FRAME_SYNC_CODEWORD, 32))
    for _ in range(16):
        bits.append(number_to_bits(POCSAG_IDLE_CODEWORD, 32))
    stream = np.concatenate(bits)

    framer = prepare_block(POCSAGFramerBlock(), [Bit])
    frames = run_block(framer, [stream], splits=(100, 400, 700))[0]
    assert len(frames) == 1
    assert frames[0].address == address
    assert frames[0].func == 2
    assert frames[0].data == words

    dec = prepare_block(POCSAGDecoderBlock("both"),
                        [POCSAGFramerBlock.POCSAGFrameType])
    msgs = dec.process(frames)
    assert msgs[0].alphanumeric == "HI"
    assert msgs[0].address == address


# ---------------------------------------------------------------------------
# AX.25
# ---------------------------------------------------------------------------

def test_ax25_framer():
    frame_bits = ax25_encode([("APRS", 0x30), ("KD2BMH", 0x3A)],
                             0x03, 0xF0, b"Hello AX.25!")
    flag = np.asarray([0, 1, 1, 1, 1, 1, 1, 0], dtype=np.uint8)
    stream = np.concatenate([
        np.asarray(RNG.integers(0, 2, 41), dtype=np.uint8) if False else
        np.zeros(41, dtype=np.uint8),
        flag, hdlc_stuff(frame_bits), flag,
        np.zeros(29, dtype=np.uint8)])
    blk = prepare_block(AX25FramerBlock(), [Bit])
    frames = run_block(blk, [stream], splits=(50, 120, 300))[0]
    assert len(frames) == 1
    f = frames[0]
    assert f.addresses[0]["callsign"] == "APRS  "
    assert f.addresses[0]["ssid"] == 0x30
    assert f.addresses[1]["callsign"] == "KD2BMH"
    assert f.addresses[1]["ssid"] == 0x3A
    assert f.control == 0x03
    assert f.pid == 0xF0
    assert f.payload == "Hello AX.25!"


# ---------------------------------------------------------------------------
# ERT: SCM / SCM+ / IDM
# ---------------------------------------------------------------------------

def test_scm_framer():
    preamble = SCMFramerBlock.SCM_PREAMBLE
    ert_id = 0x2ABCDEF
    consumption = 123456
    msg = np.concatenate([
        number_to_bits(ert_id >> 24, 2),    # id msb
        number_to_bits(0, 1),               # reserved
        number_to_bits(1, 2),               # physical tamper
        number_to_bits(7, 4),               # ert type
        number_to_bits(2, 2),               # encoder tamper
        number_to_bits(consumption, 24),
        number_to_bits(ert_id & 0xFFFFFF, 24)])
    frame = np.concatenate([preamble, scm_encode(msg)])
    stream = np.concatenate([np.zeros(17, dtype=np.uint8), frame,
                             np.zeros(31, dtype=np.uint8)])
    # inject a correctable error in the codeword
    corrupted = stream.copy()
    corrupted[17 + 21 + 30] ^= 1
    blk = prepare_block(SCMFramerBlock(), [Bit])
    frames = run_block(blk, [corrupted], splits=(40, 90))[0]
    assert len(frames) == 1
    assert frames[0].ert_id == ert_id
    assert frames[0].consumption == consumption
    assert frames[0].ert_type == 7


def test_scm_plus_framer():
    sync = SCMPlusFramerBlock.SCM_PLUS_PREAMBLE
    msg = np.concatenate([
        number_to_bits(0x1E, 8),           # protocol id
        number_to_bits(0xAB, 8),           # ert type
        number_to_bits(0x01020304, 32),    # ert id
        number_to_bits(987654, 32),        # consumption
        number_to_bits(0x5A5A, 16)])       # tamper
    crc = _crc16_ccitt_bits(msg)
    frame = np.concatenate([sync, msg, number_to_bits(crc, 16)])
    stream = np.concatenate([np.zeros(9, dtype=np.uint8), frame,
                             np.zeros(20, dtype=np.uint8)])
    blk = prepare_block(SCMPlusFramerBlock(), [Bit])
    frames = run_block(blk, [stream], splits=(60,))[0]
    assert len(frames) == 1
    assert frames[0].ert_id == 0x01020304
    assert frames[0].consumption == 987654
    assert frames[0].tamper == 0x5A5A


def test_idm_framer():
    ert_id = 0x11223344
    body = np.zeros(688, dtype=np.uint8)
    body[0:8] = number_to_bits(0x1C, 8)        # packet type
    body[8:24] = number_to_bits(0x5CC6, 16)    # packet length
    body[24:32] = number_to_bits(0x04, 8)      # application version
    body[32:40] = number_to_bits(0x17, 8)      # ert type
    body[40:72] = number_to_bits(ert_id, 32)   # ert id
    body[200:232] = number_to_bits(55555, 32)  # last consumption count
    # serial crc over ert id bits (frame offset 72 = body offset 40)
    serial_crc = _crc16_ccitt_bits(body[40:72])
    body[672:688] = number_to_bits(serial_crc, 16)
    packet_crc = _crc16_ccitt_bits(body)
    frame = np.concatenate([
        number_to_bits(0x5555, 16), number_to_bits(0x16A3, 16),
        body, number_to_bits(packet_crc, 16)])
    assert len(frame) == IDMFramerBlock.IDM_FRAME_LEN
    stream = np.concatenate([np.zeros(13, dtype=np.uint8), frame,
                             np.zeros(40, dtype=np.uint8)])
    blk = prepare_block(IDMFramerBlock(), [Bit])
    frames = run_block(blk, [stream], splits=(300, 600))[0]
    assert len(frames) == 1
    assert frames[0].ert_id == ert_id
    assert frames[0].last_consumption_count == 55555
    assert frames[0].serial_crc == serial_crc
    assert frames[0].packet_crc == packet_crc


# ---------------------------------------------------------------------------
# Varicode
# ---------------------------------------------------------------------------

def test_varicode_decoder():
    text = "Hello PSK31!"
    bits = []
    bits.extend([0, 0])
    for ch in text:
        bits.extend(int(c) for c in VARICODE[ord(ch)])
        bits.extend([0, 0])
    blk = prepare_block(VaricodeDecoderBlock(), [Bit])
    out = run_block(blk, [np.asarray(bits, dtype=np.uint8)],
                    splits=(13, 40, 70))[0]
    assert bytes(out.tolist()).decode() == text
