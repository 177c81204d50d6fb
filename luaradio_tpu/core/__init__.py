from luaradio_tpu.core.block import (Block, HostBlock, HostSourceBlock, Input,
                                     Output, SignalBlock, SignalSourceBlock,
                                     SinkBlock, SourceBlock)
from luaradio_tpu.core.composite import CompositeBlock, Graph
from luaradio_tpu.core.runtime import Runner

__all__ = [
    "Block", "HostBlock", "HostSourceBlock", "Input", "Output", "SignalBlock",
    "SignalSourceBlock", "SinkBlock", "SourceBlock", "CompositeBlock", "Graph",
    "Runner",
]
