"""Native cumsum/cummax vs manual two-level (block matmul / log-shift)
formulations at the pulse kernel's geometry: (50, 24696) f32/int32."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

cache_dir = os.path.expanduser("~/.cache/goofer_tpu/xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B, n, BLK = 50, 24696, 128
rng = np.random.default_rng(0)
x = jax.device_put((rng.random((B, n)) * 0.01).astype(np.float32))
iv = jax.device_put(
    np.where(rng.random((B, n)) > 0.99,
             np.tile(np.arange(n, dtype=np.int32), (B, 1)), -1))


def bench(name, fn, *args, reps=12):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    _ = float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} med {np.median(ts) * 1e3:7.2f} ms  "
          f"min {min(ts) * 1e3:7.2f} ms", flush=True)


bench("RTT baseline", lambda a: a[:, :8] + 1.0, x, reps=20)
bench("native cumsum (50,24696)", lambda a: jnp.cumsum(a, axis=-1), x)

n_pad = -(-n // BLK) * BLK
TRI = np.tril(np.ones((BLK, BLK), np.float32))          # inclusive prefix


def two_level_cumsum(a):
    p = jnp.pad(a, ((0, 0), (0, n_pad - n)))
    blocks = p.reshape(B, n_pad // BLK, BLK)
    within = jnp.einsum("bgk,jk->bgj", blocks, jnp.asarray(TRI),
                        preferred_element_type=jnp.float32)
    sums = within[:, :, -1]
    offs = jnp.cumsum(sums, axis=-1) - sums              # exclusive
    out = within + offs[:, :, None]
    return out.reshape(B, n_pad)[:, :n]


bench("two-level cumsum (matmul blocks)", two_level_cumsum, x)

bench("native cummax int32", lambda a: jax.lax.cummax(a, axis=1), iv)


def two_level_cummax(a):
    p = jnp.pad(a, ((0, 0), (0, n_pad - n)), constant_values=-1)
    blocks = p.reshape(B, n_pad // BLK, BLK)
    v = blocks
    s = 1
    while s < BLK:
        shifted = jnp.pad(v, ((0, 0), (0, 0), (s, 0)),
                          constant_values=-1)[:, :, :BLK]
        v = jnp.maximum(v, shifted)
        s *= 2
    bmax = v[:, :, -1]
    offs = jax.lax.cummax(bmax, axis=1)
    offs = jnp.concatenate(
        [jnp.full((B, 1), -1, offs.dtype), offs[:, :-1]], axis=1)
    out = jnp.maximum(v, offs[:, :, None])
    return out.reshape(B, n_pad)[:, :n]


bench("two-level cummax (log-shift blocks)", two_level_cummax, iv)

a1 = np.asarray(jax.jit(lambda a: jnp.cumsum(a, axis=-1))(x))
a2 = np.asarray(jax.jit(two_level_cumsum)(x))
print("cumsum max abs diff:", float(np.max(np.abs(a1 - a2))), flush=True)
m1 = np.asarray(jax.jit(lambda a: jax.lax.cummax(a, axis=1))(iv))
m2 = np.asarray(jax.jit(two_level_cummax)(iv))
print("cummax exact:", bool((m1 == m2).all()), flush=True)
