"""Blocked vs Pallas pulse accumulation runtime on the live TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from goofer_tpu.ops.pulse import pulse_train

SR = 44100
for n in (32768, 131072):
    f0 = np.full(n, 220.0, np.float32)
    f0[: n // 8] = 0.0
    f0j = jnp.asarray(f0)
    for name, up in (("blocked", False), ("pallas", True)):
        fn = jax.jit(lambda f, up=up: pulse_train(f, SR, use_pallas=up))
        t0 = time.perf_counter()
        fn.lower(f0j).compile()
        tc = time.perf_counter() - t0
        r = fn(f0j); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(20):
            r = fn(f0j)
        jax.block_until_ready(r)
        tr = (time.perf_counter() - t0) / 20
        print(f"n={n:7d} {name:8s} compile={tc:6.2f}s run={tr*1e3:7.3f}ms",
              flush=True)
    # batched (vmap 16)
    f0b = jnp.asarray(np.stack([f0] * 16))
    for name, up in (("blocked", False), ("pallas", True)):
        fn = jax.jit(jax.vmap(lambda f, up=up: pulse_train(f, SR, use_pallas=up)))
        t0 = time.perf_counter()
        fn.lower(f0b).compile()
        tc = time.perf_counter() - t0
        r = fn(f0b); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(10):
            r = fn(f0b)
        jax.block_until_ready(r)
        tr = (time.perf_counter() - t0) / 10
        print(f"n={n:7d} {name:8s} vmap16 compile={tc:6.2f}s run={tr*1e3:7.3f}ms",
              flush=True)
