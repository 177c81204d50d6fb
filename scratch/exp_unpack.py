"""Experiments: deinterleave strategies + decimating FIR on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

C, T = 8, 1 << 22
NS = C * T
rng = np.random.default_rng(0)
xp = jnp.asarray(rng.standard_normal((C, 2 * T)).astype(np.float32))


def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    out = f(*args); float(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); float(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best*1e3:8.2f} ms   {NS/best/1e9:8.3f} GS/s")


# -- deinterleave variants ---------------------------------------------------
def unpack_reshape(x):
    lead = x.shape[:-1]
    p = x.reshape(lead + (x.shape[-1] // 2, 2))
    return jnp.sum(p[..., 0]) + jnp.sum(p[..., 1])

def unpack_stride(x):
    return jnp.sum(x[..., 0::2]) + jnp.sum(x[..., 1::2])

# selection matmul: [.., nb, 256] @ S[256, 256] -> [re128 | im128]
_S = np.zeros((256, 256), np.float32)
for j in range(128):
    _S[2 * j, j] = 1.0
    _S[2 * j + 1, 128 + j] = 1.0
_Sj = jnp.asarray(_S)

def unpack_matmul(x):
    lead = x.shape[:-1]
    nb = x.shape[-1] // 256
    fr = x.reshape(lead + (nb, 256))
    y = jnp.einsum("...nc,cd->...nd", fr, _Sj,
                   precision=lax.Precision.HIGHEST)
    re = y[..., :128].reshape(lead + (nb * 128,))
    im = y[..., 128:].reshape(lead + (nb * 128,))
    return jnp.sum(re) + jnp.sum(im)

def unpack_matmul_disc(x):
    """deinterleave matmul + discriminator (shift via concat) + atan2."""
    lead = x.shape[:-1]
    nb = x.shape[-1] // 256
    fr = x.reshape(lead + (nb, 256))
    y = jnp.einsum("...nc,cd->...nd", fr, _Sj,
                   precision=lax.Precision.HIGHEST)
    re = y[..., :128].reshape(lead + (nb * 128,))
    im = y[..., 128:].reshape(lead + (nb * 128,))
    rp = jnp.concatenate([re[..., :1], re[..., :-1]], axis=-1)
    ip = jnp.concatenate([im[..., :1], im[..., :-1]], axis=-1)
    tre = re * rp + im * ip
    tim = im * rp - re * ip
    m = jnp.arctan2(tim, tre)
    return jnp.sum(m)

# half-size blocks: [.., nb, 256] @ S2[256,128] twice? same flops; skip.

# -- raw bandwidth reference -------------------------------------------------
def just_sum(x):
    return jnp.sum(x)

def axpy(x):
    return jnp.sum(x * 1.0001 + 0.5)

timeit("just_sum (read 8B/cplx)", just_sum, xp)
timeit("unpack_reshape (current)", unpack_reshape, xp)
timeit("unpack_stride", unpack_stride, xp)
timeit("unpack_matmul", unpack_matmul, xp)
timeit("unpack_matmul+disc+atan2", unpack_matmul_disc, xp)

# -- decimating FIR: polyphase framed matmul --------------------------------
m_in = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
K = 432  # combined LPF+deemph taps, multiple of 8
D = 8
taps = rng.standard_normal(K).astype(np.float32)

def fir_decim_poly(m):
    # y[j] = sum_k h[k] m[8j + k - (K-1)]  (causal);  frames of 128 outputs
    lead = m.shape[:-1]
    n_out = m.shape[-1] // D
    Q = K // D
    B = 128
    nf = n_out // B
    # phases: M[c, t8, p] = m[c, 8*t8 + p]
    M = m.reshape(lead + (m.shape[-1] // D, D))
    # frame windows over t8 axis with Q-1 halo (causal left pad)
    pad = jnp.zeros(lead + (Q - 1, D), m.dtype)
    Mp = jnp.concatenate([pad, M], axis=-2)  # [c, n8+Q-1, 8]
    # frames [c, nf, (B+Q-1)*8]
    W = B + Q - 1
    idx_ok = (nf * B + Q - 1)
    flat = Mp.reshape(lead + (-1,))
    # build frames via reshape+concat trick (hop B blocks of 8)
    x2 = flat[..., : (nf * B + Q - 1) * D]
    # simple: use conv via matmul with Toeplitz per phase stacked
    # T2[(q,p), b] = h[8q + p] placed so frames @ T2 = y
    fr_parts = []
    for s in range(0, W, B):  # W < 2B for Q-1 < 128
        blk = Mp[..., :, :]  # placeholder
    # fallback: lax.conv_general_dilated treating phases as features
    # input [c, n8+Q-1, 8] -> NWC;  kernel [Q, 8, 1]
    h2 = taps.reshape(Q, D)  # h[8q+p]
    kern = jnp.asarray(h2[::-1 if False else slice(None)])  # [Q, 8]
    y = lax.conv_general_dilated(
        Mp, kern[:, :, None],
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    return jnp.sum(y)

def fir_decim_matmul(m):
    lead = m.shape[:-1]
    n8 = m.shape[-1] // D
    Q = K // D
    B = 128
    nf = n8 // B
    M = m.reshape(lead + (n8, D))
    pad = jnp.zeros(lead + (Q - 1, D), m.dtype)
    Mp = jnp.concatenate([pad, M], axis=-2)          # [c, n8+Q-1, 8]
    flatw = Mp.reshape(lead + ((n8 + Q - 1) * D,))
    # frames of (B+Q-1)*8 floats with hop B*8
    P = (Q - 1) * D
    BB = B * D
    x2 = jnp.concatenate(
        [flatw, jnp.zeros(lead + ((nf + 1) * BB + P - flatw.shape[-1],),
                          m.dtype)], axis=-1).reshape(lead + (nf + 1, BB))
    fr = jnp.concatenate([x2[..., :-1, :], x2[..., 1:, :P]], axis=-1)
    # tap matrix Tm[(w), b] : y[b] = sum_{q,p} h[8q+p] * fr[(b*8) + 8q + p... ]
    # fr[f, j] = flatw[f*BB + j] = Mp[(f*BB+j)//8, (f*BB+j)%8]
    # y[f, b] = sum_k h[k] * M[f*B + b - (Q-1) + ceil..]: construct numerically
    W = BB + P
    Tm = np.zeros((W, B), np.float32)
    for b in range(B):
        for k in range(K):
            # y[f,b] = sum_k h[k] * m[8*(f*B+b) + k - (K-1)+7]  (align causal)
            j = b * D + k
            if 0 <= j < W:
                Tm[j, b] = taps[K - 1 - k]
    y = jnp.einsum("...fw,wb->...fb", fr, jnp.asarray(Tm),
                   precision=lax.Precision.HIGHEST)
    return jnp.sum(y)

timeit("fir_decim conv_general (NWC)", fir_decim_poly, m_in)
timeit("fir_decim framed matmul", fir_decim_matmul, m_in)
