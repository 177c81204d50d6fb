"""Platform introspection and feature flags.

Reference analog: /root/reference/radio/core/platform.lua (OS/arch/cpu
introspection, acceleration feature flags, env-var disables).  Here the
"acceleration backends" are the TPU/XLA backend itself and the optional
native host library.
"""

from __future__ import annotations

import os
import platform as _platform
import sys


def _jax_info():
    import jax
    try:
        devices = jax.devices()
    except RuntimeError:
        devices = []
    return {
        "jax_version": jax.__version__,
        "backend": jax.default_backend() if devices else "none",
        "devices": [str(d) for d in devices],
        "device_count": len(devices),
    }


class features:
    """Feature flags (reference platform.features)."""

    @staticmethod
    def native() -> bool:
        from luaradio_tpu.utils import native as _native
        return _native.available()

    @staticmethod
    def tpu() -> bool:
        import jax
        try:
            return jax.default_backend() not in ("cpu",)
        except RuntimeError:
            return False


def info() -> dict:
    d = {
        "os": _platform.system().lower(),
        "arch": _platform.machine(),
        "python": sys.version.split()[0],
        "features": {"native": features.native(), "tpu": features.tpu()},
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("LUARADIO_TPU_")},
    }
    d.update(_jax_info())
    return d


def time_us() -> int:
    """Microsecond monotonic timestamp (reference platform.time_us)."""
    import time
    return time.monotonic_ns() // 1000


__all__ = ["features", "info", "time_us"]
