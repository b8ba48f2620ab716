"""Decide the production pulse path with data (VERDICT r1 item 3).

Times the Pallas pulse kernel against the blocked-XLA formulation,
COMPILED on the real chip, across (batch, length, min_spacing).  Timing
methodology per docs/PERFORMANCE.md: reduce to a scalar, fetch it per
rep (block_until_ready does not synchronize through this image's device
tunnel), subtract the RTT baseline.
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

from goofer_tpu.ops.pulse import pulse_train  # noqa: E402

SR = 44100


def bench(name, fn, *args, reps=8):
    f = jax.jit(lambda *a: jnp.sum(fn(*a)).astype(jnp.float32))
    try:
        t0 = time.perf_counter()
        _ = float(f(*args))
        compile_s = time.perf_counter() - t0
    except Exception as e:  # Mosaic compile/runtime failure
        print(f"{name:44s} FAILED: {type(e).__name__}: {e}", flush=True)
        return None
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(f(*args))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) * 1e3
    print(f"{name:44s} med {med:8.2f} ms  min {min(times)*1e3:8.2f} ms  "
          f"(compile {compile_s:.1f}s)", flush=True)
    return med


def f0_batch(b, n, hz):
    f0 = np.full((b, n), hz, np.float32)
    f0[:, : n // 8] = 0.0
    t = np.arange(n) / SR
    f0 = f0 * (2.0 ** (0.1 * np.sin(2 * np.pi * 1.3 * t)))[None, :]
    return jax.device_put(f0.astype(np.float32))


tiny = jax.device_put(np.zeros(8, np.float32))
rtt = bench("RTT baseline (sum of 8)", lambda x: x + 1.0, tiny, reps=20)

print("\n(batch, n, f0) blocked vs pallas — medians include ~RTT "
      f"{rtt:.1f} ms", flush=True)
results = []
for b, n, hz in [(1, 24696, 220.0), (8, 24696, 220.0), (24, 24696, 220.0),
                 (50, 24696, 220.0), (8, 98304, 220.0), (8, 24696, 80.0),
                 (8, 24696, 440.0)]:
    f0_d = f0_batch(b, n, hz)
    mb = bench(f"blocked  b{b:<3d} n{n:<6d} f0={hz:.0f}",
               jax.vmap(lambda f: pulse_train(f, SR)), f0_d)
    mp = bench(f"pallas   b{b:<3d} n{n:<6d} f0={hz:.0f}",
               jax.vmap(lambda f: pulse_train(f, SR, use_pallas=True)),
               f0_d)
    if mb is not None and mp is not None:
        results.append((b, n, hz, mb, mp))

print("\nsummary (RTT-subtracted):")
for b, n, hz, mb, mp in results:
    print(f"  b{b:<3d} n{n:<6d} f0={hz:4.0f}  blocked {mb - rtt:7.2f} ms"
          f"  pallas {mp - rtt:7.2f} ms  ratio {mp / mb:5.2f}")
