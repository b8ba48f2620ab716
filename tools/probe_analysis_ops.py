"""Honest (fetch-timed) breakdown of the fused analysis graph:
envelope, pitch (ACF + Viterbi), formants (Burg + roots), knot sweep."""
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

from goofer_tpu.analysis.formants import formant_graph
from goofer_tpu.analysis.pitch import PitchConfig, pitch_graph
from goofer_tpu.ops.filters import gaussian_blur1d
from goofer_tpu.ops.stft import stft

sr, n_fft, hop = 44100, 1024, 256
n = int(0.6 * sr)
rng = np.random.default_rng(0)
t = np.arange(n) / sr
y = (0.4 * np.sign(np.sin(2 * np.pi * 220 * t))
     + 0.02 * rng.standard_normal(n)).astype(np.float32)
y_d = jax.device_put(y)


def bench(name, fn, *args, reps=8):
    f = jax.jit(lambda *a: jnp.sum(fn(*a)).astype(jnp.float32))
    _ = float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} med {np.median(ts) * 1e3:7.1f} ms   "
          f"min {min(ts) * 1e3:7.1f} ms", flush=True)


bench("RTT baseline", lambda x: x[:8] + 1.0, y_d, reps=16)
bench("stft + env blur",
      lambda x: gaussian_blur1d(jnp.abs(stft(x, n_fft, hop)) + 1e-8, 2.0,
                                axis=0), y_d)
bench("pitch_graph (ACF + Viterbi)",
      lambda x: pitch_graph(x, sr, hop / sr, PitchConfig(f0_min=75.0)), y_d)
bench("formant_graph (Burg + roots)",
      lambda x: formant_graph(x, sr, hop / sr), y_d)
