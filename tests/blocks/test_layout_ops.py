"""ops.layout (polyphase split/merge) and ops.fir.fir_decimate correctness,
on both the fallback path and the MXU selection-matmul path (forced on CPU
via LUARADIO_TPU_FORCE_MXU_LAYOUT — the analog of the reference's
acceleration-matrix CI, which runs every backend against the same vectors)."""

import os

import numpy as np
import pytest

RNG = np.random.default_rng(7)


@pytest.fixture(params=[False, True], ids=["fallback", "mxu"])
def mxu_forced(request, monkeypatch):
    if request.param:
        monkeypatch.setenv("LUARADIO_TPU_FORCE_MXU_LAYOUT", "1")
    else:
        monkeypatch.delenv("LUARADIO_TPU_FORCE_MXU_LAYOUT", raising=False)
    return request.param


@pytest.mark.parametrize("k", [2, 3, 5, 8])
@pytest.mark.parametrize("shape", [(2048,), (2, 3840)])
def test_phase_split_merge(mxu_forced, k, shape):
    from luaradio_tpu.ops.layout import phase_merge, phase_split
    n = shape[-1] - shape[-1] % (128 * k) if mxu_forced else \
        shape[-1] - shape[-1] % k
    n = max(n, 128 * k * 4) if mxu_forced else max(n, k)
    x = RNG.standard_normal(shape[:-1] + (n,)).astype(np.float32)
    parts = phase_split(x, k)
    for p in range(k):
        np.testing.assert_array_equal(np.asarray(parts[p]), x[..., p::k])
    back = phase_merge(parts)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_phase_split_complex(mxu_forced):
    from luaradio_tpu.ops.layout import phase_split
    x = (RNG.standard_normal(2048) + 1j * RNG.standard_normal(2048)
         ).astype(np.complex64)
    parts = phase_split(x, 2)
    np.testing.assert_array_equal(np.asarray(parts[0]), x[0::2])
    np.testing.assert_array_equal(np.asarray(parts[1]), x[1::2])


def test_upsample_zero_stuff(mxu_forced):
    from luaradio_tpu.ops.layout import upsample_zero_stuff
    x = RNG.standard_normal(1024).astype(np.float32)
    y = np.asarray(upsample_zero_stuff(x, 3))
    exp = np.zeros(3072, np.float32)
    exp[::3] = x
    np.testing.assert_array_equal(y, exp)


def test_unpack_pack_roundtrip(mxu_forced):
    from luaradio_tpu.ops.complexutil import pack_complex, unpack_complex
    z = (RNG.standard_normal(4096) + 1j * RNG.standard_normal(4096)
         ).astype(np.complex64)
    pay = z.view(np.float32)
    z2 = np.asarray(unpack_complex(pay))
    np.testing.assert_array_equal(z2, z)
    pay2 = np.asarray(pack_complex(z2))
    np.testing.assert_array_equal(pay2, pay)


@pytest.mark.parametrize("k,d", [(1, 4), (16, 5), (129, 8), (432, 8),
                                 (63, 2), (200, 25)])
@pytest.mark.parametrize("cplx_x,cplx_h", [(False, False), (True, False),
                                           (True, True), (False, True)])
def test_fir_decimate_oracle(k, d, cplx_x, cplx_h):
    import jax.numpy as jnp
    from luaradio_tpu.ops.fir import fir_decimate, fir_decimate_init_state

    n = 128 * d * 3 + 4 * d  # several frames plus a ragged tail frame
    if cplx_x:
        x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
             ).astype(np.complex64)
    else:
        x = RNG.standard_normal(n).astype(np.float32)
    if cplx_h:
        h = (RNG.standard_normal(k) + 1j * RNG.standard_normal(k)
             ).astype(np.complex64)
    else:
        h = RNG.standard_normal(k).astype(np.float32)

    dt = np.complex64 if (cplx_x or cplx_h) else np.float32
    xin = np.concatenate([np.zeros(k - 1, x.dtype), x])
    full = np.convolve(xin.astype(np.complex128 if dt == np.complex64
                                  else np.float64),
                       h.astype(np.complex128 if dt == np.complex64
                                else np.float64))[k - 1:k - 1 + n]
    exp = full[::d].astype(dt)

    tail = fir_decimate_init_state(k, x.dtype)
    y, new_tail = fir_decimate(jnp.asarray(x), h, tail, d)
    got = np.asarray(y)
    assert got.shape == (n // d,)
    assert np.max(np.abs(got - exp)) < 2e-4 * max(1.0, np.max(np.abs(exp)))
    if k > 1:
        np.testing.assert_allclose(np.asarray(new_tail), x[-(k - 1):],
                                   rtol=0, atol=0)


def test_fir_decimate_streaming_state():
    """Chunked calls must equal the whole-vector result (the reference's
    sample-by-sample jig discipline)."""
    import jax.numpy as jnp
    from luaradio_tpu.ops.fir import fir_decimate, fir_decimate_init_state

    k, d = 97, 4
    n = 4096
    x = RNG.standard_normal(n).astype(np.float32)
    h = RNG.standard_normal(k).astype(np.float32)

    tail = fir_decimate_init_state(k, np.float32)
    whole, _ = fir_decimate(jnp.asarray(x), h, tail, d)

    tail = fir_decimate_init_state(k, np.float32)
    outs = []
    for i in range(0, n, 512):
        y, tail = fir_decimate(jnp.asarray(x[i:i + 512]), h, tail, d)
        outs.append(np.asarray(y))
    chunked = np.concatenate(outs)
    np.testing.assert_allclose(chunked, np.asarray(whole), atol=1e-5)


def test_iir_to_fir_taps():
    import scipy.signal
    from luaradio_tpu.ops.fir import iir_to_fir_taps
    b = np.array([0.05, 0.05])
    a = np.array([1.0, -0.9])
    h = iir_to_fir_taps(b, a, tol=1e-12)
    assert h is not None and 100 < len(h) < 4096
    x = RNG.standard_normal(5000)
    exp = scipy.signal.lfilter(b, a, x)
    got = scipy.signal.lfilter(h, [1.0], x)
    assert np.max(np.abs(got - exp)) < 1e-9

    # non-decaying filter is rejected
    assert iir_to_fir_taps([1.0], [1.0, -1.0]) is None
