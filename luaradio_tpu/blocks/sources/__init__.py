from luaradio_tpu.blocks.sources.bank import *  # noqa: F401,F403
from luaradio_tpu.blocks.sources.files import *  # noqa: F401,F403
from luaradio_tpu.blocks.sources.network import *  # noqa: F401,F403
from luaradio_tpu.blocks.sources.sdr import *  # noqa: F401,F403
from luaradio_tpu.blocks.sources.signal import *  # noqa: F401,F403
