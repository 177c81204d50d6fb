import sys
sys.path.insert(0, "/root/repo")
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, head, tile = 8, 512, 8192
NT = 4


def _kernel(x_ref, carry_ref, out_ref, xw_ref, sem):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cp0 = pltpu.make_async_copy(carry_ref.at[:, pl.ds(0, head)],
                                    xw_ref.at[:, pl.ds(0, head)], sem)
        cp0.start()
        cp0.wait()

    @pl.when(i > 0)
    def _():
        start = pl.multiple_of(i * 2 * tile - head, 128)
        cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(start, head)],
                                   xw_ref.at[:, pl.ds(0, head)], sem)
        cp.start()
        cp.wait()

    start = pl.multiple_of(i * 2 * tile, 128)
    cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(start, 2 * tile)],
                               xw_ref.at[:, pl.ds(head, 2 * tile)], sem)
    cp.start()
    cp.wait()
    out_ref[:, :] = xw_ref[:, :]


rng = np.random.default_rng(0)
x = rng.standard_normal((C, 2 * tile * NT)).astype(np.float32)
carry = np.zeros((C, head), np.float32)

out = pl.pallas_call(
    _kernel,
    grid=(NT,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((C, head + 2 * tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((C, NT * (head + 2 * tile)), jnp.float32),
    scratch_shapes=[pltpu.VMEM((C, head + 2 * tile), jnp.float32),
                    pltpu.SemaphoreType.DMA],
)(jnp.asarray(x), jnp.asarray(carry))
out = np.asarray(out)

W = head + 2 * tile
ok = True
for i in range(NT):
    w = out[:, i * W:(i + 1) * W]
    if i == 0:
        exp_head = carry
    else:
        exp_head = x[:, i * 2 * tile - head: i * 2 * tile]
    exp_body = x[:, i * 2 * tile:(i + 1) * 2 * tile]
    eh = np.abs(w[:, :head] - exp_head).max(axis=1)
    eb = np.abs(w[:, head:] - exp_body).max(axis=1)
    print(f"tile {i}: head err per ch {eh}  body err max {eb.max():.1e}")
    if eh.max() > 0 or eb.max() > 0:
        ok = False
print("OK" if ok else "DMA MISMATCH")
