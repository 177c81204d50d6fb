import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from luaradio_tpu.parallel.flagship import make_wbfm_mono_step

C, T = 8, 1 << 22
step, init_state = make_wbfm_mono_step(if_rate=256e3, decimation=8)
fn = jax.jit(step, donate_argnums=(0,))
state = init_state(C)
x = jnp.asarray(np.random.default_rng(0).standard_normal((C, 2 * T)).astype(np.float32))

t0 = time.perf_counter()
state, audio = fn(state, x)
f = float(state[0][0, 0])
print(f"warmup+compile: {time.perf_counter()-t0:.1f}s", flush=True)

for k in (2, 8, 32):
    t0 = time.perf_counter()
    for _ in range(k):
        state, audio = fn(state, x)
    float(state[0][0, 0])
    dt = time.perf_counter() - t0
    print(f"k={k}: {dt*1e3:.1f} ms total, {dt/k*1e3:.2f} ms/step, "
          f"{C*T*k/dt/1e9:.2f} GS/s", flush=True)
