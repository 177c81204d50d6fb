from luaradio_tpu.composites.am import *  # noqa: F401,F403
from luaradio_tpu.composites.fm import *  # noqa: F401,F403
from luaradio_tpu.composites.receivers import *  # noqa: F401,F403
from luaradio_tpu.composites.resampling import *  # noqa: F401,F403
