import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from luaradio_tpu.parallel.flagship import make_wbfm_mono_step

C = 8
tile = 128*8*8  # 8192
T = 4*tile
rng = np.random.default_rng(0)
z = (rng.standard_normal((C, 2*T)) + 1j*rng.standard_normal((C, 2*T))).astype(np.complex64)
x1 = jnp.asarray(np.ascontiguousarray(z[:, :T]).view(np.float32))
x2 = jnp.asarray(np.ascontiguousarray(z[:, T:]).view(np.float32))

step_p, init_p = make_wbfm_mono_step(use_pallas=True)
step_x, init_x = make_wbfm_mono_step(use_pallas=False)
jp = jax.jit(step_p); jx = jax.jit(step_x)
sp, ap1 = jp(init_p(C), x1)
sp, ap2 = jp(sp, x2)
sx, ax1 = jx(init_x(C), x1)
sx, ax2 = jx(sx, x2)

for name, ap, ax in (("step1", ap1, ax1), ("step2", ap2, ax2)):
    ap = np.asarray(ap); ax = np.asarray(ax)
    err = np.abs(ap - ax); scale = np.max(np.abs(ax))
    print(f"== {name}: overall max rel {err.max()/scale:.2e}")
    ot = tile//8
    # per-channel error in tile 0's first 256 outputs
    for ch in range(C):
        e = err[ch, :256]
        bad = np.nonzero(e > 1e-3*scale)[0]
        print(f"  ch{ch}: tile0 first256 max {e.max()/scale:.2e}  nbad {len(bad)} "
              f"range [{bad[0] if len(bad) else '-'}..{bad[-1] if len(bad) else '-'}]")
