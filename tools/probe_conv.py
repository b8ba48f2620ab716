"""Measure compile time of direct vs FFT 1-D conv on the live TPU."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

def direct(x2d, kernel):
    lhs = x2d[:, None, :]
    rhs = jnp.asarray(kernel, dtype=x2d.dtype)[None, None, :]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[:, 0, :]

def fftconv(x2d, kernel):
    b, length = x2d.shape
    ksize = kernel.shape[0]
    out_len = length - ksize + 1
    nfft = int(length)
    kf = jnp.fft.rfft(jnp.asarray(kernel, dtype=x2d.dtype), n=nfft)
    xf = jnp.fft.rfft(x2d, n=nfft, axis=-1)
    full = jnp.fft.irfft(xf * kf[None, :], n=nfft, axis=-1)
    return jax.lax.dynamic_slice_in_dim(full, ksize - 1, out_len, axis=1)

def timeit(fn, x, k):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    lowered = f.lower(x, k).compile()
    tc = time.perf_counter() - t0
    r = f(x, k); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5):
        r = f(x, k)
    jax.block_until_ready(r)
    trun = (time.perf_counter() - t0) / 5
    return tc, trun

for L in (6600, 26460):
    for taps in (9, 17, 33, 65, 201):
        x = jnp.asarray(np.random.randn(1, L).astype(np.float32))
        k = np.hamming(taps).astype(np.float32)
        tf, rf = timeit(fftconv, x, k)
        print(f"L={L:6d} taps={taps:4d} fft:    compile={tf:6.2f}s run={rf*1e3:7.3f}ms", flush=True)
    for taps in (9, 17, 33, 65):
        x = jnp.asarray(np.random.randn(1, L).astype(np.float32))
        k = np.hamming(taps).astype(np.float32)
        td, rd = timeit(direct, x, k)
        print(f"L={L:6d} taps={taps:4d} direct: compile={td:6.2f}s run={rd*1e3:7.3f}ms", flush=True)
