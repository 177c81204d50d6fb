"""Mid-graph host blocks under channel-banked mesh execution.

The generic RDSReceiver graph — device front end + HOST framer/decoder
tail — must run banked over a ("channel",) mesh: the runtime clones each
host block per channel (carrying per-channel sync state) and feeds it its
row of the banked boundary arrays.  Round 2 raised NotImplementedError
here; the reference's one scheduler runs any graph
(/root/reference/radio/core/composite.lua:514-950), so must this one.
"""

import numpy as np

import jax
from jax.sharding import Mesh

import luaradio_tpu as radio
from luaradio_tpu.core.composite import CompositeBlock
from luaradio_tpu.blocks.sources.bank import BankSource
from tests.core.test_receivers import ArraySource, CollectSink
from tests.parallel.test_rds_bank import make_rds_fm

RATE = 228000.0
RNG = np.random.default_rng(47)


def test_rds_receiver_banked_decodes_every_channel():
    nch = 4
    mesh = Mesh(np.array(jax.devices("cpu")[:nch]), ("channel",))

    per_ch_groups = [
        [tuple(int(v) for v in RNG.integers(0, 1 << 16, 4))
         for _ in range(6)]
        for _ in range(nch)]
    n = 1 << 18
    srcs = [ArraySource(make_rds_fm(n, g), RATE) for g in per_ch_groups]

    top = CompositeBlock()
    rx = radio.RDSReceiver(pilot="vector")
    sink = CollectSink()
    top.connect(BankSource(srcs), rx, sink)
    top.run(chunk_size=1 << 17, mesh=mesh, channels=nch)

    raw_found = {tuple(p.data["frame"]) for p in sink.items
                 if p.data.get("type") == "raw"}
    # every channel's stream must decode independently (clock/sync state is
    # per-clone): at least half of each channel's groups must come through
    for ch, groups in enumerate(per_ch_groups):
        recovered = [g for g in groups if g in raw_found]
        assert len(recovered) >= 3, (ch, groups, sorted(raw_found))


def test_host_block_feeding_device_still_rejected():
    """Variable-length host streams cannot re-enter banked device segments:
    the runtime must say so up front."""
    import pytest

    from luaradio_tpu.core.runtime import Runner

    nch = 2
    mesh = Mesh(np.array(jax.devices("cpu")[:nch]), ("channel",))
    n = 1 << 12
    srcs = [ArraySource((RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
                         ).astype(np.complex64), 1e6) for _ in range(nch)]
    top = CompositeBlock()
    # ThrottleBlock is a host block whose output feeds a device block
    top.connect(BankSource(srcs), radio.ThrottleBlock(1e6),
                radio.NopBlock(), radio.NopSink())
    with pytest.raises(NotImplementedError, match="ThrottleBlock"):
        Runner(top, mode="fused", chunk_size=1 << 10, mesh=mesh,
               channels=nch)
