from luaradio_tpu.blocks.signal.carrier import *  # noqa: F401,F403
from luaradio_tpu.blocks.signal.channelizer import *  # noqa: F401,F403
from luaradio_tpu.blocks.signal.digital import *  # noqa: F401,F403
from luaradio_tpu.blocks.signal.filtering import *  # noqa: F401,F403
from luaradio_tpu.blocks.signal.math import *  # noqa: F401,F403
from luaradio_tpu.blocks.signal.modem import *  # noqa: F401,F403
from luaradio_tpu.blocks.signal.sampling import *  # noqa: F401,F403
