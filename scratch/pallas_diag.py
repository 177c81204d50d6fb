import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from luaradio_tpu.parallel.flagship import make_wbfm_mono_step

C = 8
tile = 128*8*8  # 8192
T = 8*tile
rng = np.random.default_rng(0)
z = (rng.standard_normal((C, T)) + 1j*rng.standard_normal((C, T))).astype(np.complex64)
x = jnp.asarray(np.ascontiguousarray(z).view(np.float32))

step_p, init_p = make_wbfm_mono_step(use_pallas=True)
step_x, init_x = make_wbfm_mono_step(use_pallas=False)
sp, ap = jax.jit(step_p)(init_p(C), x)
sx, ax = jax.jit(step_x)(init_x(C), x)
ap = np.asarray(ap); ax = np.asarray(ax)
err = np.abs(ap - ax)
scale = np.max(np.abs(ax))
ot = tile//8
print("audio shape", ap.shape, "tiles:", T//tile)
for t0 in range(T//tile):
    e = err[:, t0*ot:(t0+1)*ot]
    # error profile within the tile: first 128, middle, last 128
    print(f"tile {t0}: max {e.max()/scale:.2e}  first128 {e[:, :128].max()/scale:.2e} "
          f"mid {e[:, 128:-128].max()/scale:.2e} last128 {e[:, -128:].max()/scale:.2e}", flush=True)
# column profile of worst tile
t0 = int(np.argmax([err[:, t0*ot:(t0+1)*ot].max() for t0 in range(T//tile)]))
e = err[0, t0*ot:(t0+1)*ot]
bad = np.nonzero(e > 1e-3*scale)[0]
print("worst tile", t0, "bad idx count", len(bad), "first bad:", bad[:16], "last:", bad[-8:] if len(bad) else "-")
