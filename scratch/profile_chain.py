"""Profile flagship WBFM chain stages on the real chip."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np

import jax
import jax.numpy as jnp

cache = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from luaradio_tpu.parallel.flagship import make_wbfm_mono_step
from luaradio_tpu.ops.fir import fir_direct
from luaradio_tpu.ops.scan import linrec_first_order
from luaradio_tpu.ops.complexutil import unpack_complex
from luaradio_tpu.utils import filter_design
from luaradio_tpu.blocks.signal.filtering import _singlepole_lowpass_coeffs

C, T = 8, 1 << 22
NS = C * T
rng = np.random.default_rng(0)
xp = jnp.asarray(rng.standard_normal((C, 2 * T)).astype(np.float32))
m_in = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))

taps = jnp.asarray(filter_design.firwin_lowpass(128, 15e3 / 128e3).astype(np.float32))
tail = jnp.zeros((C, 127), jnp.float32)


def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    float(out)  # host fetch = proof of completion on tunneled backends
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:8.2f} ms   {NS/best/1e9:8.3f} GS/s")
    return best


# 1. unpack + conj-mul + atan2 (discriminator)
def disc(xp):
    x = unpack_complex(xp)
    prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    t = x * jnp.conj(prev)
    return jnp.sum(jnp.arctan2(t.imag, t.real))

# conj-mul only
def conjmul(xp):
    x = unpack_complex(xp)
    prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    t = x * jnp.conj(prev)
    return jnp.sum(t.real) + jnp.sum(t.imag)

def fir_only(m):
    y, _ = fir_direct(m, taps, tail)
    return jnp.sum(y)

def linrec_only(m):
    y = linrec_first_order(m, np.float32(0.95), jnp.zeros((C,), jnp.float32))
    return jnp.sum(y)

step, init_state = make_wbfm_mono_step(if_rate=256e3, decimation=8)
state = init_state(C)
def full(state, xp):
    st, audio = step(state, xp)
    return jnp.sum(audio)

timeit("conjmul", conjmul, xp)
timeit("discriminator(atan2)", disc, xp)
timeit("fir_direct_128", fir_only, m_in)
timeit("linrec_first_order", linrec_only, m_in)

f = jax.jit(full)
out = f(state, xp); jax.block_until_ready(out)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); out = f(state, xp); float(out)
    best = min(best, time.perf_counter() - t0)
print(f"{'full chain':28s} {best*1e3:8.2f} ms   {NS/best/1e9:8.3f} GS/s")
