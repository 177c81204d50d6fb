import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# 1. pure round-trip latency: trivial scalar
f = jax.jit(lambda x: x + 1.0)
x = jnp.float32(0.0)
float(f(x))
t0 = time.perf_counter()
for _ in range(20):
    x = f(x)
    float(x)
lat = (time.perf_counter() - t0) / 20
print(f"scalar roundtrip latency: {lat*1e3:.3f} ms")

# 2. async dispatch chain: N dependent calls, one fetch
def chain_test(T, n_calls=8):
    y = jnp.zeros((8, T), jnp.float32)
    g = jax.jit(lambda y: y * 1.0001 + 0.5)
    s = jax.jit(lambda y: jnp.sum(y))
    float(s(g(y)))
    t0 = time.perf_counter()
    z = y
    for _ in range(n_calls):
        z = g(z)
    float(s(z))
    dt = time.perf_counter() - t0
    ns = 8 * T * n_calls
    print(f"axpy T={T:>9}, {n_calls} chained: {dt*1e3:8.2f} ms "
          f"{ns/dt/1e9:8.2f} G elem/s  ({ns*8/dt/1e9:7.1f} GB/s rw)")

chain_test(1 << 20)
chain_test(1 << 22)
chain_test(1 << 24)
chain_test(1 << 24, 16)
