from luaradio_tpu.ops import fir, mixer, scan  # noqa: F401
