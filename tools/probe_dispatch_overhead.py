"""Hypothesis: per-call dispatch cost scales with the number of argument
buffers (tunnel RPC per buffer), not bytes.  Time a trivial jitted fn with
1 vs 16 vs 48 small args, numpy and device-resident, and measure whether
block_until_ready actually waits (compare with a heavy matmul chain)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"{name:44s} med {np.median(times) * 1e3:8.2f} ms   "
          f"min {min(times) * 1e3:8.2f} ms", flush=True)


rng = np.random.default_rng(0)
xs48 = [rng.standard_normal(1000).astype(np.float32) for _ in range(48)]
xs16, xs1 = xs48[:16], xs48[:1]


def mk(k):
    return jax.jit(lambda *a: sum(jnp.sum(x) for x in a))


f1, f16, f48 = mk(1), mk(16), mk(48)
bench("sum of 1 numpy arg", f1, *xs1)
bench("sum of 16 numpy args", f16, *xs16)
bench("sum of 48 numpy args", f48, *xs48)

d48 = [jax.device_put(x) for x in xs48]
jax.block_until_ready(d48)
bench("sum of 1 device arg", f1, *d48[:1])
bench("sum of 16 device args", f16, *d48[:16])
bench("sum of 48 device args", f48, *d48)

# does block_until_ready wait? a matmul chain with known heavy compute
A = jax.device_put(rng.standard_normal((4096, 4096)).astype(np.float32))
jax.block_until_ready(A)


def chain(a, iters):
    def body(_, x):
        return x @ x * 1e-4
    return jax.lax.fori_loop(0, iters, body, a)


c10 = jax.jit(lambda a: chain(a, 10))
c100 = jax.jit(lambda a: chain(a, 100))
bench("matmul chain x10 (4096^2)", c10, A, reps=5)
bench("matmul chain x100 (4096^2)", c100, A, reps=5)
# x100 should take ~10x the x10 time if block_until_ready really waits
