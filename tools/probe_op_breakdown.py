"""Per-op compute breakdown of the main synthesis graph on the real chip:
time batched sub-graphs (pulse train, STFT/iSTFT, noise phases, blurs,
mask smoothing, full body) at the bench geometry (batch 50, n=24696)."""
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
from goofer_tpu.ops.filters import (
    gaussian_blur1d, gaussian_blur_complex_freq, smooth_mask_downsampled)
from goofer_tpu.ops.pulse import pulse_train
from goofer_tpu.ops.stft import istft, stft

B, n, sr, n_fft, hop = 50, 24696, 44100, 1024, 256
n_bins = n_fft // 2 + 1
rng = np.random.default_rng(0)
f0 = np.full((B, n), 220.0, np.float32)
f0[:, : n // 8] = 0.0
mask = (f0 > 75).astype(np.float32)
t_frames = 1 + n // hop
env = (np.exp(-np.linspace(0, 5, n_bins))[:, None]
       * np.ones((1, t_frames)) + 1e-5).astype(np.float32)
env_b = np.broadcast_to(env, (B, n_bins, t_frames)).copy()
pulse_in = rng.standard_normal((B, n)).astype(np.float32)
S = rng.standard_normal((B, n_bins, t_frames)).astype(np.float32) \
    + 1j * rng.standard_normal((B, n_bins, t_frames)).astype(np.float32)
S = S.astype(np.complex64)


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


bench("pulse_train (b50, 24.7k)",
      jax.jit(jax.vmap(lambda f: pulse_train(f, sr))), f0)
bench("stft (b50)",
      jax.jit(jax.vmap(lambda x: stft(x, n_fft, hop))), pulse_in)
bench("istft (b50)",
      jax.jit(jax.vmap(lambda s: istft(s, hop, length=n))), S)
bench("3x istft (b50)",
      jax.jit(jax.vmap(lambda s: (istft(s, hop, length=n),
                                  istft(s, hop, length=n),
                                  istft(s, hop, length=n)))), S)
bench("blur_complex 0.5 x2 (b50)",
      jax.jit(jax.vmap(lambda s: gaussian_blur_complex_freq(
          gaussian_blur_complex_freq(s, 0.5), 0.5))), S)
bench("smooth_mask ds4 sigma100 (b50)",
      jax.jit(jax.vmap(lambda m: smooth_mask_downsampled(m, 100.0, 4))), mask)
bench("env blur 1.75 (b50)",
      jax.jit(jax.vmap(lambda e: gaussian_blur1d(e, 1.75, axis=0))), env_b)


def frame_phases_probe(key):
    from goofer_tpu.engine.synth import _frame_phases
    return _frame_phases(key, n_bins, t_frames)


keys = jax.vmap(lambda i: jax.random.PRNGKey(i))(jnp.arange(B))
bench("frame_phases (b50)",
      jax.jit(jax.vmap(frame_phases_probe)), keys)

st = SynthStatic(sr=sr, n_fft=n_fft, hop=hop, n=n)
knobs = {k: jnp.asarray(v, jnp.float32) for k, v in default_knobs().items()}
tracks = np.zeros((B, 4, t_frames), np.float32)
bench("FULL synth body (b50)",
      jax.jit(jax.vmap(partial_synth := (
          lambda e, f, m, tr, k: synth_core_impl(st, e, f, m, tr, knobs, k)))),
      env_b, f0, mask, tracks, keys)
