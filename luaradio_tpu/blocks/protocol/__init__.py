from luaradio_tpu.blocks.protocol.ax25 import *  # noqa: F401,F403
from luaradio_tpu.blocks.protocol.ert import *  # noqa: F401,F403
from luaradio_tpu.blocks.protocol.pocsag import *  # noqa: F401,F403
from luaradio_tpu.blocks.protocol.rds import *  # noqa: F401,F403
from luaradio_tpu.blocks.protocol.varicode import *  # noqa: F401,F403
