import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from luaradio_tpu.parallel.flagship import make_wbfm_mono_step

C, T = 8, 1 << 22
rng = np.random.default_rng(0)
z = (rng.standard_normal((C, T)) + 1j*rng.standard_normal((C, T))).astype(np.complex64)
x = jnp.asarray(np.ascontiguousarray(z).view(np.float32))

# correctness vs XLA path on a small aligned slice
ts = 1 << 16
step_p, init_p = make_wbfm_mono_step(use_pallas=True)
step_x, init_x = make_wbfm_mono_step(use_pallas=False)
fp = jax.jit(step_p); fx = jax.jit(step_x)
sp = init_p(C); sx = init_x(C)
xs = x[:, :2*ts]
t0=time.perf_counter(); (spn, ap) = fp(sp, xs); ap_np = np.asarray(ap)
print(f"pallas compile+run small: {time.perf_counter()-t0:.1f}s", flush=True)
(sxn, axx) = fx(sx, xs); ax_np = np.asarray(axx)
err = np.max(np.abs(ap_np - ax_np)) / max(np.max(np.abs(ax_np)), 1e-3)
print(f"rel err vs XLA: {err:.2e}", flush=True)
assert err < 2e-5

# throughput on the big shape
fp = jax.jit(step_p, donate_argnums=(0,))
st = init_p(C)
st, a = fp(st, x); float(st[0][0,0])
for trial in range(6):
    kk = 16
    t0=time.perf_counter()
    for _ in range(kk):
        st, a = fp(st, x)
    float(st[0][0,0])
    dt=time.perf_counter()-t0
    print(f"trial {trial}: {dt/kk*1e3:7.2f} ms/step  {C*T*kk/dt/1e9:6.2f} GS/s", flush=True)
