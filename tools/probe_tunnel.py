import time
import numpy as np
import jax, jax.numpy as jnp

f = jax.jit(lambda x: x + 1.0)
x1 = jnp.zeros((8,), jnp.float32)
f(x1).block_until_ready()
# tiny round trip
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(f(x1))
    print(f"tiny rtt: {(time.perf_counter()-t0)/10*1e3:.1f}ms", flush=True)

# d2h bandwidth: 5.6MB int16
big = jax.jit(lambda: jnp.zeros((97, 29000), jnp.int16))
b = big(); b.block_until_ready()
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(big())
    dt = time.perf_counter()-t0
    print(f"d2h 5.6MB: {dt*1e3:.0f}ms = {5.6/dt:.0f}MB/s", flush=True)
# h2d
h = np.zeros((97, 29000), np.int16)
g = jax.jit(lambda x: x.sum())
g(h).block_until_ready()
for _ in range(3):
    t0 = time.perf_counter()
    g(h).block_until_ready()
    dt = time.perf_counter()-t0
    print(f"h2d 5.6MB+reduce: {dt*1e3:.0f}ms", flush=True)
# f32 d2h 11MB
big2 = jax.jit(lambda: jnp.zeros((97, 29000), jnp.float32))
b = big2(); b.block_until_ready()
for _ in range(2):
    t0 = time.perf_counter()
    np.asarray(big2())
    dt = time.perf_counter()-t0
    print(f"d2h 11.2MB f32: {dt*1e3:.0f}ms = {11.2/dt:.0f}MB/s", flush=True)
