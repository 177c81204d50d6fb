"""Marginal-cost profiling: per-step cost = (t(K2 steps) - t(K1 steps)) / (K2-K1)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from luaradio_tpu.parallel.flagship import make_wbfm_mono_step

C, T = 8, 1 << 22
NS = C * T
rng = np.random.default_rng(0)
xp = jnp.asarray(rng.standard_normal((C, 2 * T)).astype(np.float32))
m_in = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))


def marginal(name, step, state0, x, reps=2):
    """step: (state, x) -> state (all device-resident). Chained dispatch."""
    f = jax.jit(step, donate_argnums=(0,))
    s = f(state0, x)
    sm = jax.jit(lambda s: sum(jnp.sum(l) for l in jax.tree.leaves(s)))
    float(sm(s))

    def run(k):
        nonlocal s
        t0 = time.perf_counter()
        for _ in range(k):
            s = f(s, x)
        float(sm(s))
        return time.perf_counter() - t0

    best = 1e9
    for _ in range(reps):
        t1 = run(2)
        t2 = run(18)
        best = min(best, (t2 - t1) / 16)
    print(f"{name:32s} {best*1e3:8.2f} ms/step  {NS/best/1e9:8.3f} GS/s")
    return best


# full chain
step, init_state = make_wbfm_mono_step(if_rate=256e3, decimation=8)
state = init_state(C)
def chain_step(st, x):
    st2, audio = step(st, x)
    return (*st2[:4], st2[4] + jnp.sum(audio) * 0)  # keep deps
marginal("full chain (current)", lambda st, x: step(st, x)[0], state, xp)

# unpack via matmul + disc + atan2, writing m
_S = np.zeros((256, 256), np.float32)
for j in range(128):
    _S[2 * j, j] = 1.0
    _S[2 * j + 1, 128 + j] = 1.0
_Sj = jnp.asarray(_S)

def disc_matmul(st, x):
    lead = x.shape[:-1]
    nb = x.shape[-1] // 256
    fr = x.reshape(lead + (nb, 256))
    y = jnp.einsum("...nc,cd->...nd", fr, _Sj,
                   precision=lax.Precision.HIGHEST)
    re = y[..., :128].reshape(lead + (nb * 128,))
    im = y[..., 128:].reshape(lead + (nb * 128,))
    rp = jnp.concatenate([st[0], re[..., :-1]], axis=-1)
    ip = jnp.concatenate([st[1], im[..., :-1]], axis=-1)
    tre = re * rp + im * ip
    tim = im * rp - re * ip
    m = jnp.arctan2(tim, tre)
    return (re[..., -1:], im[..., -1:], jnp.sum(m, keepdims=True)[..., None])

marginal("unpack_mm+disc+atan2",
         disc_matmul,
         (jnp.zeros((C, 1)), jnp.zeros((C, 1)), jnp.zeros((C, 1))), xp)

# decimating FIR via framed matmul, K=432, D=8
K, D, B = 432, 8, 128
taps = rng.standard_normal(K).astype(np.float32)
Q = K // D
W = B * D + (Q - 1) * D
Tm = np.zeros((W, B), np.float32)
for b in range(B):
    for k in range(K):
        j = b * D + k
        Tm[j, b] = taps[K - 1 - k]
Tmj = jnp.asarray(Tm)

def fir_decim(st, m):
    lead = m.shape[:-1]
    n8 = m.shape[-1] // D
    nf = n8 // B
    P = (Q - 1) * D
    BB = B * D
    mcat = jnp.concatenate([st[0], m], axis=-1)  # [c, (Q-1)*8 + T]
    x2 = mcat[..., :nf * BB + P]
    x3 = jnp.concatenate(
        [x2, jnp.zeros(lead + ((nf + 1) * BB - (nf * BB + P),), m.dtype)],
        axis=-1).reshape(lead + (nf + 1, BB))
    fr = jnp.concatenate([x3[..., :-1, :], x3[..., 1:, :P]], axis=-1)
    y = jnp.einsum("...fw,wb->...fb", fr, Tmj,
                   precision=lax.Precision.HIGHEST)
    return (mcat[..., -P:], jnp.sum(y, keepdims=True)[..., None] * 0 + st[1])

marginal("fir_decim_mm K=432 D=8",
         fir_decim, (jnp.zeros((C, (Q - 1) * D)), jnp.zeros((C, 1))), m_in)

# fused candidate chain: disc_matmul + fir_decim in one jit
def fused(st, x):
    s1 = disc_matmul((st[0], st[1], st[2]), x)
    # recompute m inside (XLA fuses); reuse code quickly:
    lead = x.shape[:-1]
    nb = x.shape[-1] // 256
    fr = x.reshape(lead + (nb, 256))
    y = jnp.einsum("...nc,cd->...nd", fr, _Sj,
                   precision=lax.Precision.HIGHEST)
    re = y[..., :128].reshape(lead + (nb * 128,))
    im = y[..., 128:].reshape(lead + (nb * 128,))
    rp = jnp.concatenate([st[0], re[..., :-1]], axis=-1)
    ip = jnp.concatenate([st[1], im[..., :-1]], axis=-1)
    tre = re * rp + im * ip
    tim = im * rp - re * ip
    m = jnp.arctan2(tim, tre)
    s2 = fir_decim((st[3], st[4]), m)
    return (re[..., -1:], im[..., -1:], st[2], s2[0], s2[1])

marginal("fused disc+decimFIR",
         fused,
         (jnp.zeros((C, 1)), jnp.zeros((C, 1)), jnp.zeros((C, 1)),
          jnp.zeros((C, (Q - 1) * D)), jnp.zeros((C, 1))), xp)
