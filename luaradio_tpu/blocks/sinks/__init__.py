from luaradio_tpu.blocks.sinks.audio import *  # noqa: F401,F403
from luaradio_tpu.blocks.sinks.files import *  # noqa: F401,F403
from luaradio_tpu.blocks.sinks.misc import *  # noqa: F401,F403
from luaradio_tpu.blocks.sinks.network import *  # noqa: F401,F403
from luaradio_tpu.blocks.sinks.plot import *  # noqa: F401,F403
from luaradio_tpu.blocks.sinks.sdr import *  # noqa: F401,F403
