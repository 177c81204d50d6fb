"""Native format-conversion library tests (skipped when not built)."""

import numpy as np
import pytest

from luaradio_tpu.utils import format as fmt
from luaradio_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

RNG = np.random.default_rng(41)


@pytest.mark.parametrize("name", sorted(fmt.FORMATS))
def test_native_roundtrip_matches_numpy(name):
    f = fmt.get_format(name)
    x = RNG.uniform(-0.99, 0.99, 10000).astype(np.float32)
    b_nat = native.f32_to_raw_bytes(x, name, f.offset, f.scale)
    raw_np = fmt.float_to_raw(x, f).tobytes()
    # allow rare rounding-tie differences (rint vs np.round)
    diff = sum(a != b for a, b in zip(b_nat, raw_np))
    assert diff < len(b_nat) * 0.001
    back = native.raw_bytes_to_f32(b_nat, name, f.offset, f.scale)
    eps = 1e-2 if f.itemsize == 1 else 1e-4
    assert np.max(np.abs(back - x)) < eps


def test_format_module_uses_native():
    x = (RNG.uniform(-0.9, 0.9, 1000) + 1j * RNG.uniform(-0.9, 0.9, 1000)
         ).astype(np.complex64)
    f = fmt.get_format("s16le")
    b = fmt.complex_to_bytes(x, f)
    back = fmt.bytes_to_complex(b, f)
    assert np.max(np.abs(back - x)) < 1e-4
