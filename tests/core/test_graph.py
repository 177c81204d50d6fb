"""Graph core tests: connect, flatten, topo sort, differentiate, rates,
chunk planning (analog of /root/reference/tests/core/composite_spec.lua)."""

import numpy as np
import pytest

from luaradio_tpu import (AddBlock, CompositeBlock, DownsamplerBlock,
                          FrequencyDiscriminatorBlock, Input,
                          LowpassFilterBlock, MultiplyConjugateBlock, NopSink,
                          Output, SignalSource, UpsamplerBlock, ZeroSource)
from luaradio_tpu.core.composite import Graph
from luaradio_tpu.types import ComplexFloat32, Float32


def test_linear_connect_and_topo():
    top = CompositeBlock()
    src = ZeroSource(ComplexFloat32, 1000.0)
    ds = DownsamplerBlock(4)
    sink = NopSink()
    top.connect(src, ds, sink)
    g = Graph(top)
    order = [type(b).__name__ for b in g.order]
    assert order == ["ZeroSource", "DownsamplerBlock", "NopSink"]


def test_unconnected_input_raises():
    top = CompositeBlock()
    a = ZeroSource(ComplexFloat32, 1.0)
    m = MultiplyConjugateBlock()
    sink = NopSink()
    top.connect(a, "out", m, "in1")
    top.connect(m, sink)
    with pytest.raises(ValueError, match="unconnected"):
        Graph(top)


def test_double_connect_raises():
    top = CompositeBlock()
    a = ZeroSource(ComplexFloat32, 1.0)
    b = ZeroSource(ComplexFloat32, 1.0)
    sink = NopSink()
    top.connect(a, sink)
    with pytest.raises(ValueError, match="already connected"):
        top.connect(b, sink)


def test_type_differentiation_and_rates():
    top = CompositeBlock()
    src = ZeroSource(ComplexFloat32, 8000.0)
    disc = FrequencyDiscriminatorBlock(1.0)
    ds = DownsamplerBlock(2)
    sink = NopSink()
    top.connect(src, disc, ds, sink)
    g = Graph(top)
    assert disc.get_input_type() == ComplexFloat32
    assert disc.get_output_type() == Float32
    assert disc.get_rate() == 8000.0
    assert ds.get_rate() == 4000.0
    assert sink.input_rate == 4000.0


def test_rate_mismatch_raises():
    top = CompositeBlock()
    a = ZeroSource(Float32, 1000.0)
    b = ZeroSource(Float32, 2000.0)
    add = AddBlock()
    sink = NopSink()
    top.connect(a, "out", add, "in1")
    top.connect(b, "out", add, "in2")
    top.connect(add, sink)
    with pytest.raises(ValueError, match="mismatched input rates"):
        Graph(top)


def test_cycle_detection():
    top = CompositeBlock()
    add = AddBlock()
    src = ZeroSource(Float32, 1.0)
    sink = NopSink()
    top.connect(src, "out", add, "in1")
    top.connect(add, "out", add, "in2")  # self-loop
    top.connect(add, "out", sink, "in")
    with pytest.raises(ValueError, match="cycle"):
        Graph(top)


def test_chunk_planning_rational_rates():
    top = CompositeBlock()
    src = ZeroSource(ComplexFloat32, 6000.0)
    up = UpsamplerBlock(3)
    ds = DownsamplerBlock(2)
    sink = NopSink()
    top.connect(src, up, ds, sink)
    g = Graph(top)
    s, u, d = g.out_chunk[id(src)], g.out_chunk[id(up)], g.out_chunk[id(ds)]
    assert u == 3 * s
    assert d == u // 2
    assert g.in_chunk[id(ds)] % ds.chunk_multiple() == 0


def test_hierarchical_composite_aliasing():
    class Doubler(CompositeBlock):
        def __init__(self):
            super().__init__()
            self.add_type_signature([Input("in", Float32)],
                                    [Output("out", Float32)])
            a = AddBlock()
            self.connect(self, "in", a, "in1")
            self.connect(self, "in", a, "in2")
            self.connect(a, "out", self, "out")

    top = CompositeBlock()
    src = SignalSource("constant", 0.0, 100.0, amplitude=2.0)
    doubler = Doubler()
    sink = NopSink()
    top.connect(src, doubler, sink)
    g = Graph(top)
    names = sorted(type(b).__name__ for b in g.blocks)
    assert names == ["AddBlock", "NopSink", "SignalSource"]
    add = [b for b in g.blocks if type(b).__name__ == "AddBlock"][0]
    assert add.get_rate() == 100.0


def test_incommensurable_source_rates_rejected():
    """An irrational rate pair must fail loudly, not silently quantize
    (chunk-planner guard)."""
    import math
    import pytest
    from luaradio_tpu import (CompositeBlock, MultiplyBlock, NopSink,
                              ZeroSource)
    from luaradio_tpu.core.composite import Graph
    from luaradio_tpu.types import Float32

    top = CompositeBlock()
    s1 = ZeroSource(Float32, 1e6)
    s2 = ZeroSource(Float32, 1e6 * math.pi / 3.0)
    m = MultiplyBlock()
    top.connect(s1, "out", m, "in1")
    top.connect(s2, "out", m, "in2")
    top.connect(m, NopSink())
    with pytest.raises(ValueError):
        Graph(top, chunk_size=4096)


def test_coprime_chunk_multiples_guarded():
    """Pathological coprime chunk-multiple combinations raise a diagnostic
    instead of silently exploding chunk sizes."""
    import pytest
    from luaradio_tpu import (CompositeBlock, DownsamplerBlock, NopSink,
                              UpsamplerBlock, ZeroSource)
    from luaradio_tpu.core.composite import Graph
    from luaradio_tpu.types import Float32

    top = CompositeBlock()
    chain = [ZeroSource(Float32, 1e6)]
    # primes whose product exceeds the planner's 2^26 guard
    for p in (251, 509, 1021, 2039):
        chain.append(UpsamplerBlock(p))
        chain.append(DownsamplerBlock(p + 2))
    chain.append(NopSink())
    top.connect(*chain)
    with pytest.raises(ValueError, match="chunk planning|chunk"):
        Graph(top, chunk_size=4096)
