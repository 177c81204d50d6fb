from luaradio_tpu.utils import (filter_design, format, math, spectrum,  # noqa: F401
                                window)
