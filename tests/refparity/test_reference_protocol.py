"""Replay the reference's shipped PROTOCOL golden vectors (framers and
decoders) through the TPU protocol blocks.

The reference serializes expected frames/packets as positional
constructor-argument tables of its object sample types
(tests/blocks/protocol/*_spec.gen.lua); the factories below build the
repo's frame objects from the same tables, and comparison canonicalizes
both sides (bytes vs latin-1 strings, tuples vs lists) before equality.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from luaradio_tpu.blocks.protocol.ax25 import AX25Frame
from luaradio_tpu.blocks.protocol.ert import IDMFrame, SCMFrame, SCMPlusFrame
from luaradio_tpu.blocks.protocol.pocsag import POCSAGFrame, POCSAGMessage
from luaradio_tpu.blocks.protocol.rds import RDSFrame, RDSPacket
from luaradio_tpu.types import Bit

from tests.jig import prepare_block, run_block
from tests.refparity import adapters
from tests.refparity.luaspec import parse_file

REF = "/root/reference/tests/blocks/protocol"


def _pad(items, n):
    return list(items) + [None] * (n - len(items))


FRAME_FACTORY = {
    # serialized as {{{blocks}}}: ctor arg is a table wrapping the table
    "RDSFrameType": lambda it: RDSFrame(tuple(it[0][0])),
    "RDSPacketType": lambda it: RDSPacket(dict(it[0]), dict(it[1])),
    "AX25FrameType": lambda it: AX25Frame(list(it[0]), it[1], it[2], it[3]),
    "POCSAGFrameType": lambda it: POCSAGFrame(it[0], it[1], list(it[2])),
    "POCSAGMessageType": lambda it: POCSAGMessage(*_pad(it, 4)),
    "SCMFrameType": lambda it: SCMFrame(*it),
    "SCMPlusFrameType": lambda it: SCMPlusFrame(*it),
    "IDMFrameType": lambda it: IDMFrame(*it),
}


def canon(v):
    """Canonical structure for cross-representation equality."""
    if isinstance(v, bytes):
        return v.decode("latin-1")
    if isinstance(v, (list, tuple)):
        return [canon(e) for e in v]
    if isinstance(v, dict):
        return {k: canon(x) for k, x in sorted(v.items())}
    if isinstance(v, np.integer):
        return int(v)
    if hasattr(v, "__dict__"):
        return {k: canon(x) for k, x in sorted(vars(v).items())}
    return v


def _objects(tv):
    fac = FRAME_FACTORY[tv.type_name]
    return [fac(item) for item in (tv.objects or [])]


@pytest.mark.parametrize("relpath", sorted(
    os.path.basename(p) for p in glob.glob(f"{REF}/*.gen.lua")
    if parse_file(p).block_name in adapters.OBJECT_OUTPUT_BLOCKS))
def test_reference_protocol_vectors(relpath):
    spec = parse_file(os.path.join(REF, relpath))
    for vec in spec.vectors:
        blk, _ = adapters.build_block(spec.block_name, vec.args)
        ins = []
        in_types = []
        for tv in vec.inputs:
            if tv.array is not None:
                ins.append(tv.array)
                in_types.append(adapters.TYPE_MAP[tv.type_name])
            else:
                objs = _objects(tv)
                ins.append(np.array(objs, dtype=object))
                in_types.append(blk.signatures[0].inputs[len(ins) - 1]
                                .accepted)
        prepare_block(blk, in_types if in_types else [Bit])
        got = run_block(blk, ins)
        for i, tv in enumerate(vec.outputs):
            exp = _objects(tv)
            g = list(got[i])
            assert len(g) == len(exp), (vec.desc, i, len(g), len(exp))
            for k, (a, b) in enumerate(zip(g, exp)):
                assert canon(a) == canon(b), (vec.desc, i, k, a, b)
