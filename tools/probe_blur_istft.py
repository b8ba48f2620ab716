"""Confirm the compute pathologies and their fixes, with device-resident
inputs (no h2d in the timed loop):
* 3 separate iSTFTs in one graph vs one batched iSTFT over stacked spectra
* conv-based freq-axis Gaussian blur vs dense-matmul blur (MXU)
"""
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

from goofer_tpu.ops.filters import gaussian_blur1d, gaussian_blur_complex_freq
from goofer_tpu.ops.stft import istft

B, n, n_fft, hop = 50, 24696, 1024, 256
n_bins = n_fft // 2 + 1
t_frames = 1 + n // hop
rng = np.random.default_rng(0)
S1h = (rng.standard_normal((B, n_bins, t_frames))
       + 1j * rng.standard_normal((B, n_bins, t_frames))
       ).astype(np.complex64)
S1 = jax.device_put(S1h)
S2 = jax.device_put(S1h * np.complex64(1.1))
S3 = jax.device_put(S1h * np.complex64(0.9))
E = jax.device_put(
    rng.standard_normal((B, n_bins, t_frames)).astype(np.float32))
jax.block_until_ready((S1, S2, S3, E))


def bench(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"{name:40s} med {np.median(times) * 1e3:8.2f} ms   "
          f"min {min(times) * 1e3:8.2f} ms", flush=True)


bench("istft x1",
      jax.jit(jax.vmap(lambda a: istft(a, hop, length=n))), S1)
bench("istft x3 separate inputs",
      jax.jit(jax.vmap(lambda a, b, c: (istft(a, hop, length=n),
                                        istft(b, hop, length=n),
                                        istft(c, hop, length=n)))),
      S1, S2, S3)


def istft_stacked(a, b, c):
    S = jnp.stack([a, b, c])                       # (3, bins, T)
    y = jax.vmap(lambda s: istft(s, hop, length=n))(S)
    return y[0], y[1], y[2]


bench("istft x3 stacked batch", jax.jit(jax.vmap(istft_stacked)), S1, S2, S3)


def blur_matrix(sigma, length, truncate=4.0):
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    idx = np.arange(length)
    m = np.zeros((length, length), np.float32)
    for j, off in enumerate(range(-radius, radius + 1)):
        src = idx + off
        src = np.abs(src)
        src = np.where(src > length - 1, 2 * (length - 1) - src, src)
        m[idx, src] += k[j]
    return m                                        # host numpy constant


M175 = blur_matrix(1.75, n_bins)
M05 = blur_matrix(0.5, n_bins)

bench("freq blur s1.75 (conv path)",
      jax.jit(jax.vmap(lambda e: gaussian_blur1d(e, 1.75, axis=0))), E)
bench("freq blur s1.75 (matmul)",
      jax.jit(jax.vmap(lambda e: jnp.asarray(M175) @ e)), E)
bench("complex blur 0.5 x2 (conv path)",
      jax.jit(jax.vmap(lambda a, b: (gaussian_blur_complex_freq(a, 0.5),
                                     gaussian_blur_complex_freq(b, 0.5)))),
      S1, S2)
bench("complex blur 0.5 x2 (matmul)",
      jax.jit(jax.vmap(lambda a, b: (
          jax.lax.complex(jnp.asarray(M05) @ a.real,
                          jnp.asarray(M05) @ a.imag),
          jax.lax.complex(jnp.asarray(M05) @ b.real,
                          jnp.asarray(M05) @ b.imag)))), S1, S2)

e1 = gaussian_blur1d(E[0], 1.75, axis=0)
e2 = jnp.asarray(M175) @ E[0]
print("blur matmul max abs diff:", float(jnp.max(jnp.abs(e1 - e2))),
      flush=True)
