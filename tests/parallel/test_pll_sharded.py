"""Time-sharded parallel-in-time PLL vs the single-device linear solver
(which tests/blocks/test_carrier.py pins against the sequential reference
loop): outputs, error stream, guards, and carried state must agree across
shard and chunk boundaries."""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from luaradio_tpu.ops.pll_linear import pll_linear
from luaradio_tpu.parallel.time import pll_linear_sharded

RNG = np.random.default_rng(31)

ALPHA, BETA = 0.05, 0.002
FMIN, FMAX = np.float32(0.10), np.float32(0.22)
W0 = 0.16  # locked tone frequency (rad/sample), inside [FMIN, FMAX]


def _tone(c, n):
    ph = 2 * np.pi * RNG.uniform(size=(c, 1))
    x = np.exp(1j * (W0 * np.arange(n)[None, :] + ph))
    x += 0.01 * (RNG.standard_normal((c, n))
                 + 1j * RNG.standard_normal((c, n)))
    return x.astype(np.complex64), ph[:, 0].astype(np.float32)


def test_pll_sharded_matches_serial_linear():
    c, t_chunk, n_chunks, mult = 2, 4096, 2, 3
    x, ph = _tone(c, t_chunk * n_chunks)

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(2, 4), ("channel", "time"))
    state_spec = (P("channel"), P("channel"), P("channel"))

    @partial(shard_map, mesh=mesh,
             in_specs=(state_spec, P("channel", "time")),
             out_specs=(P("channel"), state_spec, P("channel", "time"),
                        P("channel", "time")),
             check_vma=False)
    def step(state, xk):
        return pll_linear_sharded(xk, state, ALPHA, BETA, FMIN, FMAX, mult,
                                  "time")

    # locked initial state: phase at the tone, frequency at the tone
    st_np = (ph.copy(), ph.copy(), np.full(c, W0, np.float32))
    st_sh = jax.device_put(tuple(jnp.asarray(s) for s in st_np),
                           NamedSharding(mesh, P("channel")))

    outs, errs = [], []
    for k in range(n_chunks):
        xk = jax.device_put(jnp.asarray(x[:, k * t_chunk:(k + 1) * t_chunk]),
                            NamedSharding(mesh, P("channel", "time")))
        valid, st_sh, out, err = jax.jit(step)(st_sh, xk)
        assert bool(np.all(np.asarray(valid)))
        outs.append(np.asarray(out))
        errs.append(np.asarray(err))
    got_out = np.concatenate(outs, axis=-1)
    got_err = np.concatenate(errs, axis=-1)

    # serial reference: the single-device linear solver per channel
    for ch in range(c):
        st = (jnp.float32(st_np[0][ch]), jnp.float32(st_np[1][ch]),
              jnp.float32(st_np[2][ch]))
        ref_out, ref_err = [], []
        for k in range(n_chunks):
            v, st, o, e = pll_linear(
                jnp.asarray(x[ch, k * t_chunk:(k + 1) * t_chunk]), st,
                ALPHA, BETA, FMIN, FMAX, mult)
            assert bool(v)
            ref_out.append(np.asarray(o))
            ref_err.append(np.asarray(e))
        ro = np.concatenate(ref_out)
        re_ = np.concatenate(ref_err)
        assert np.max(np.abs(got_out[ch] - ro)) < 2e-3
        assert np.max(np.abs(got_err[ch] - re_)) < 2e-3


def test_pll_sharded_guards_reject_unlocked():
    c, t = 2, 8192
    # tone ABOVE fmax: clamp rails -> guards must reject
    x = np.exp(1j * 0.5 * np.arange(t))[None, :].repeat(c, 0).astype(
        np.complex64)

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(2, 4), ("channel", "time"))
    state_spec = (P("channel"), P("channel"), P("channel"))

    @partial(shard_map, mesh=mesh,
             in_specs=(state_spec, P("channel", "time")),
             out_specs=(P("channel"), state_spec, P("channel", "time"),
                        P("channel", "time")),
             check_vma=False)
    def step(state, xk):
        return pll_linear_sharded(xk, state, ALPHA, BETA, FMIN, FMAX, 1,
                                  "time")

    st = tuple(jax.device_put(jnp.zeros(c, jnp.float32) + (W0 if i == 2
                                                           else 0.0),
                              NamedSharding(mesh, P("channel")))
               for i in range(3))
    xk = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P("channel", "time")))
    valid, _, _, _ = jax.jit(step)(st, xk)
    assert not bool(np.any(np.asarray(valid)))
