"""luaradio_tpu — a TPU-native software-defined-radio framework.

A brand-new flow-graph signal-processing framework with the capabilities of
LuaRadio (reference: /root/reference), designed TPU-first: blocks are pure
functions over fixed-size sample chunks, a flow graph compiles to fused
jitted XLA programs, DSP kernels lower to the MXU/VPU (convolutions, FFTs,
associative scans), and scaling uses jax.sharding meshes with ICI collectives
instead of processes and sockets.

Public namespace mirrors the reference's flat ``radio.*`` registry
(/root/reference/radio/init.lua:40-48): every block, composite, and type is
reachable directly as ``luaradio_tpu.<Name>``.
"""

__version__ = "0.1.0"

# Version surface mirrors the reference (radio/init.lua:18-21):
# _VERSION/version strings, decimal-encoded number, and an info table.
_VERSION = version = __version__
version_number = 100  # xxyyzz decimal encoding of 0.1.0
version_info = {"major": 0, "minor": 1, "patch": 0}

from luaradio_tpu import types  # noqa: F401
from luaradio_tpu.blocks import *  # noqa: F401,F403
from luaradio_tpu.blocks.protocol import *  # noqa: F401,F403
from luaradio_tpu.composites import *  # noqa: F401,F403
from luaradio_tpu.core import (Block, CompositeBlock, HostBlock,  # noqa: F401
                               HostSourceBlock, Input, Output, SignalBlock,
                               SignalSourceBlock, SinkBlock, SourceBlock)
from luaradio_tpu.types import (Bit, Byte, ComplexFloat32,  # noqa: F401
                                Float32)

# Core modules exposed as submodule attributes, mirroring radio.platform /
# radio.block / radio.debug (radio/init.lua:23-28).
from luaradio_tpu.core import block, debug, platform  # noqa: F401,E402
from luaradio_tpu import blocks, composites, utils  # noqa: F401,E402
