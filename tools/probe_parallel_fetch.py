"""Does the device->host tunnel give more aggregate bandwidth to
concurrent fetches?  Fetch a 5.6 MB int16 buffer whole vs in 2/4/8
row-chunks pulled by a thread pool (device-side slices, so each chunk is
its own buffer fetch)."""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

cache_dir = os.path.expanduser("~/.cache/goofer_tpu/xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B, n = 96, 29000                       # ~5.6 MB int16
make = jax.jit(lambda k: (jax.random.normal(k, (B, n)) * 1000
                          ).astype(jnp.int16))
out = make(jax.random.PRNGKey(0))
_ = np.asarray(out[:1, :8])            # force completion

for chunks in (1, 2, 4, 8):
    rows = B // chunks
    parts = [jax.lax.dynamic_slice_in_dim(out, i * rows, rows, axis=0)
             for i in range(chunks)]
    _ = [np.asarray(p[:1, :8]) for p in parts]   # materialize slices
    for rep in range(3):
        t0 = time.perf_counter()
        if chunks == 1:
            res = np.asarray(out)
        else:
            with ThreadPoolExecutor(max_workers=chunks) as pool:
                res = list(pool.map(np.asarray, parts))
        dt = time.perf_counter() - t0
        mb = B * n * 2 / 1e6
        print(f"chunks={chunks} rep{rep}: {dt * 1e3:6.1f} ms  "
              f"{mb / dt:6.1f} MB/s", flush=True)
