from luaradio_tpu.blocks.signal import *  # noqa: F401,F403
from luaradio_tpu.blocks.sinks import *  # noqa: F401,F403
from luaradio_tpu.blocks.sources import *  # noqa: F401,F403
