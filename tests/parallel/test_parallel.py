"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

The golden rule (SURVEY §4): golden vectors must pass identically on 1 chip
and on a sharded mesh — halo-exchange correctness is the "multi-node" test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
from functools import partial

import scipy.signal

from luaradio_tpu.ops.fir import fir_direct, fir_init_state
from luaradio_tpu.parallel.channel import ChannelBank
from luaradio_tpu.parallel.time import (cumsum_sharded,
                                        discriminator_sharded, fir_sharded,
                                        linrec_first_order_sharded)
from luaradio_tpu.parallel.wbfm import WBFMMonoBank

RNG = np.random.default_rng(55)


def _mesh(shape, names):
    devs = np.asarray(jax.devices("cpu")[:int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


@pytest.fixture(scope="module")
def time_mesh():
    return _mesh((8,), ("time",))


def test_fir_sharded_matches_serial(time_mesh):
    taps = jnp.asarray(RNG.standard_normal(33).astype(np.float32))
    x = RNG.standard_normal(4096).astype(np.float32)

    @partial(shard_map, mesh=time_mesh, in_specs=P("time"),
             out_specs=P("time"))
    def f(xs):
        return fir_sharded(xs, taps, "time")

    y = np.asarray(jax.jit(f)(jnp.asarray(x)))
    exp, _ = fir_direct(jnp.asarray(x), taps, fir_init_state(33, np.float32))
    assert np.max(np.abs(y - np.asarray(exp))) < 1e-4


def test_discriminator_sharded_matches_serial(time_mesh):
    x = (RNG.standard_normal(2048) + 1j * RNG.standard_normal(2048)
         ).astype(np.complex64)

    @partial(shard_map, mesh=time_mesh, in_specs=P("time"),
             out_specs=P("time"))
    def f(xs):
        return discriminator_sharded(xs, 1.25, "time")

    y = np.asarray(jax.jit(f)(jnp.asarray(x)))
    prev = np.concatenate([[0j], x[:-1]])
    exp = np.angle(x * np.conj(prev)) / (2 * np.pi * 1.25)
    # only the very first sample differs (serial state vs zero halo): both 0
    assert np.max(np.abs(y - exp)) < 1e-5


def test_linrec_sharded_matches_serial(time_mesh):
    u = RNG.standard_normal(4096).astype(np.float32)
    a, y0 = 0.97, 0.5

    @partial(shard_map, mesh=time_mesh, in_specs=P("time"),
             out_specs=P("time"))
    def f(us):
        return linrec_first_order_sharded(us, np.float32(a), np.float32(y0),
                                          "time")

    y = np.asarray(jax.jit(f)(jnp.asarray(u)))
    exp = scipy.signal.lfilter([1.0], [1.0, -a], u.astype(np.float64),
                               zi=[a * y0])[0]
    assert np.max(np.abs(y - exp)) < 1e-3


def test_cumsum_sharded(time_mesh):
    x = RNG.standard_normal(1024).astype(np.float32)

    @partial(shard_map, mesh=time_mesh, in_specs=P("time"),
             out_specs=P("time"))
    def f(xs):
        return cumsum_sharded(xs, "time")

    y = np.asarray(jax.jit(f)(jnp.asarray(x)))
    assert np.max(np.abs(y - np.cumsum(x.astype(np.float64)))) < 1e-3


def test_channel_bank_matches_per_channel():
    from tests.jig import prepare_block
    from luaradio_tpu import FrequencyDiscriminatorBlock, IIRFilterBlock
    from luaradio_tpu.types import ComplexFloat32, Float32

    mesh = _mesh((8,), ("channel",))
    C, T = 16, 2048
    x = (RNG.standard_normal((C, T)) + 1j * RNG.standard_normal((C, T))
         ).astype(np.complex64)

    def make_chain():
        disc = prepare_block(FrequencyDiscriminatorBlock(1.25),
                             [ComplexFloat32], rate=2.0)
        b, a = scipy.signal.butter(2, 0.2)
        iir = prepare_block(IIRFilterBlock(b, a), [Float32], rate=2.0)
        return [disc, iir]

    bank = ChannelBank(make_chain(), C, mesh=mesh)
    states = bank.init_states()
    step = bank.jit_step()
    states, y = step(states, jnp.asarray(x))
    y = np.asarray(y)

    # per-channel serial oracle
    chain = make_chain()
    for c in range(C):
        st0 = chain[0].init_state()
        st0, m = chain[0].process(st0, jnp.asarray(x[c]))
        st1 = chain[1].init_state()
        st1, out = chain[1].process(st1, m)
        assert np.max(np.abs(y[c] - np.asarray(out))) < 1e-4, f"channel {c}"


def test_wbfm_mono_bank_2d_mesh_streaming():
    """The flagship: (channel, time) 2D mesh, two chunks, matches the
    unsharded single-stream implementation including carried state."""
    mesh = _mesh((2, 4), ("channel", "time"))
    C, T, D = 4, 8192, 8
    if_rate = 256e3

    # FM-modulate C tones
    t = np.arange(2 * T) / if_rate
    audio = np.stack([0.7 * np.sin(2 * np.pi * (500 + 300 * c) * t)
                      for c in range(C)])
    phi = 2 * np.pi * 75e3 / if_rate * np.cumsum(audio, axis=-1)
    iq = np.exp(1j * phi).astype(np.complex64)

    bank = WBFMMonoBank(mesh, if_rate=if_rate, decimation=D)
    state = bank.init_state(C)
    step = bank.jit_step()
    outs = []
    for k in range(2):
        x = jax.device_put(jnp.asarray(iq[:, k * T:(k + 1) * T]),
                           NamedSharding(mesh, P("channel", "time")))
        state, y = step(state, x)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=-1)

    # serial oracle per channel
    from luaradio_tpu.ops.fir import fir_direct, fir_init_state
    from luaradio_tpu.ops.scan import linrec_first_order
    taps = np.asarray(bank.taps)
    for c in range(C):
        x = iq[c]
        prev = np.concatenate([[0j], x[:-1]])
        m = np.angle(x * np.conj(prev)) / (2 * np.pi * 1.25)
        f = scipy.signal.lfilter(taps.astype(np.float64), [1.0], m)
        b, a1 = bank._b, bank._a1
        dee = scipy.signal.lfilter(b.astype(np.float64), [1.0, a1], f)
        exp = dee[::D].astype(np.float32)
        assert np.max(np.abs(got[c] - exp)) < 2e-4, f"channel {c}"


def test_fir_fft_sharded_matches_serial(time_mesh):
    from luaradio_tpu.ops.fir import (fft_frame_length, fir_fft,
                                      fir_fft_freq_taps, fir_fft_init_state)
    from luaradio_tpu.parallel.time import fir_fft_sharded

    taps = RNG.standard_normal(129).astype(np.float32)
    l = fft_frame_length(129, min_l=512)
    hf = jnp.asarray(fir_fft_freq_taps(taps, l, False))
    n = 8 * l * 4
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
         ).astype(np.complex64)

    @partial(shard_map, mesh=time_mesh, in_specs=(P("time"), P(None)),
             out_specs=P("time"), check_vma=False)
    def f(xs, h):
        return fir_fft_sharded(xs, h, l, "time", False)

    y = np.asarray(jax.jit(f)(jnp.asarray(x), hf))
    exp, _ = fir_fft(jnp.asarray(x), hf,
                     fir_fft_init_state(l, np.complex64), False)
    assert np.max(np.abs(y - np.asarray(exp))) < 1e-3


def test_sharding_structural_overhead():
    """Fixed total work, sharded over the virtual mesh vs unsharded: the
    collective/partition overhead must stay bounded (on shared-core virtual
    devices real speedup is impossible, but the sharded program must not be
    meaningfully SLOWER — the honest single-host scaling gate; see
    bench_scaling.py / SCALING_r02.json for the recorded artifact).

    Wall-clock on a small shared host is noisy under external load (the
    accel-matrix lane runs this alongside other suites on a 2-core box):
    a failing measurement re-runs before it counts."""
    import bench_scaling

    last = None
    for _ in range(3):
        summary = bench_scaling.run(max_devices=8, emit=lambda s: None,
                                    total_t=8 * 8192 * 8)
        last = summary["max_overhead_vs_single"]
        if last < 0.30:
            return
    raise AssertionError(f"max_overhead_vs_single {last} >= 0.30 in 3 "
                         f"consecutive measurements")
