"""Masked (bucketed) vs unmasked synth-body cost at identical geometry,
honest scalar-fetch timing.  Identifies which masked op hurts."""
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

from goofer_tpu.engine.synth import SynthStatic, default_knobs, synth_core_impl

B, n, sr, n_fft, hop = 24, 32768, 44100, 1024, 256
n_bins = n_fft // 2 + 1
t_frames = 1 + n // hop
rng = np.random.default_rng(0)
f0 = np.full((B, n), 220.0, np.float32)
f0[:, : n // 8] = 0.0
mask = (f0 > 75).astype(np.float32)
env = np.broadcast_to(
    (np.exp(-np.linspace(0, 5, n_bins))[:, None]
     * np.ones((1, t_frames)) + 1e-5).astype(np.float32),
    (B, n_bins, t_frames)).copy()
tracks = np.zeros((B, 4, t_frames), np.float32)
keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
args = [jax.device_put(a) for a in (env, f0, mask, tracks)]


def knobs_for(masked):
    kn = {k: (np.broadcast_to(np.float32(v), (B,)).copy()
              if np.isscalar(v)
              else np.broadcast_to(np.asarray(v, np.float32),
                                   (B,) + np.shape(v)).copy())
          for k, v in default_knobs().items()}
    if masked:
        kn["n_true"] = np.full(B, n - 4000, np.float32)
    return {k: jax.device_put(v) for k, v in kn.items()}


def bench(name, st, kn, reps=12):
    def run(e, f, m, tr, kn1, k2):
        outs = synth_core_impl(st, e, f, m, tr, kn1, k2)
        return sum(jnp.sum(o) for o in outs)

    f = jax.vmap(run)
    g = jax.jit(lambda *a: jnp.sum(f(*a)))
    _ = float(g(*args, kn, keys))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(g(*args, kn, keys))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} med {np.median(ts) * 1e3:7.1f} ms  "
          f"min {min(ts) * 1e3:7.1f} ms", flush=True)


kn_u = knobs_for(False)
kn_m = knobs_for(True)
bench("unmasked (b24, n=32768, ms=16)",
      SynthStatic(sr=sr, n_fft=n_fft, hop=hop, n=n), kn_u)
bench("unmasked, min_spacing=128",
      SynthStatic(sr=sr, n_fft=n_fft, hop=hop, n=n, pulse_min_spacing=128),
      kn_u)
bench("masked (b24, n=32768, ms=16)",
      SynthStatic(sr=sr, n_fft=n_fft, hop=hop, n=n, masked=True), kn_m)
bench("masked, min_spacing=128",
      SynthStatic(sr=sr, n_fft=n_fft, hop=hop, n=n, masked=True,
                  pulse_min_spacing=128), kn_m)
