"""Honest per-op timings, round 2: every graph reduces to a f32 scalar
(sum) so the fetch is a plain float — avoids backend fetch quirks.
RTT baseline ~29 ms is subtracted mentally."""
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
from goofer_tpu.ops.pulse import (
    _accumulate_pulses_blocked, _compact_onset_tables, _onsets_from_phase,
    forward_fill, pulse_train)
from goofer_tpu import config
from goofer_tpu.ops.stft import istft, stft


def bench(name, fn, *args, reps=10):
    f = jax.jit(lambda *a: jnp.sum(fn(*a)).astype(jnp.float32))
    _ = float(f(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(f(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:46s} med {np.median(times) * 1e3:8.2f} ms   "
          f"min {min(times) * 1e3:8.2f} ms", flush=True)


B, n, sr, n_fft, hop = 50, 24696, 44100, 1024, 256
n_bins = n_fft // 2 + 1
t_frames = 1 + n // hop
rng = np.random.default_rng(0)

tiny = jax.device_put(np.zeros(8, np.float32))
bench("RTT baseline (sum of 8)", lambda x: x + 1.0, tiny, reps=20)

f0 = np.full((B, n), 220.0, np.float32)
f0[:, : n // 8] = 0.0
f0_d = jax.device_put(f0)
bench("pulse_train b50 (blocked)",
      jax.vmap(lambda f: pulse_train(f, sr)), f0_d)
bench("pulse_train b50 (pallas)",
      jax.vmap(lambda f: pulse_train(f, sr, use_pallas=True)), f0_d)

Ra, Rg, Rk = config.PULSE_RA, config.PULSE_RG, config.PULSE_RK


def prefix(f):
    f0v = forward_fill(f, f > 1e-6, config.PULSE_FALLBACK_F0)
    phase = jnp.cumsum(f / sr)
    onset = _onsets_from_phase(phase)
    T = 1.0 / jnp.maximum(f0v, 1e-6)
    T0 = jnp.clip(jnp.round(sr * T), config.PULSE_T0_MIN,
                  config.PULSE_T0_MAX)
    return onset, T0, T


bench("pulse prefix (ffill+cumsum+onset) b50",
      lambda f: sum(jnp.sum(x.astype(jnp.float32))
                    for x in jax.vmap(prefix)(f)), f0_d)

onset, _T0, _T = jax.jit(jax.vmap(prefix))(f0_d)


def tables(o, f):
    outs = _compact_onset_tables(n, o, f, f > 1e-6,
                                 config.PULSE_FALLBACK_F0, sr,
                                 Ra, Rg, Rk, True, 16)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in outs[1:])


bench("pulse compact tables b50", jax.vmap(tables), onset, f0_d)
bench("pulse blocked accumulate b50",
      jax.vmap(lambda o, f: _accumulate_pulses_blocked(
          n, o, f, f > 1e-6, config.PULSE_FALLBACK_F0, sr,
          Ra, Rg, Rk, True, 8)), onset, f0_d)

S1 = jax.device_put((rng.standard_normal((B, n_bins, t_frames))
                     + 1j * rng.standard_normal((B, n_bins, t_frames))
                     ).astype(np.complex64))
bench("istft b50", jax.vmap(lambda s: jnp.sum(istft(s, hop, length=n))), S1)
bench("istft x3 b50",
      jax.vmap(lambda s: (jnp.sum(istft(s, hop, length=n))
                          + jnp.sum(istft(s * 1.1, hop, length=n))
                          + jnp.sum(istft(s * 0.9, hop, length=n)))), S1)
x_d = jax.device_put(rng.standard_normal((B, n)).astype(np.float32))
bench("stft b50", jax.vmap(lambda x: jnp.sum(jnp.abs(stft(x, n_fft, hop)))),
      x_d)
E = jax.device_put(
    rng.standard_normal((B, n_bins, t_frames)).astype(np.float32))
bench("freq blur s1.75 b50",
      jax.vmap(lambda e: gaussian_blur1d(e, 1.75, axis=0)), E)
bench("complex blur 0.5 b50",
      jax.vmap(lambda s: jnp.sum(jnp.abs(
          gaussian_blur_complex_freq(s, 0.5)))), S1)
mask_d = jax.device_put((f0 > 75).astype(np.float32))
bench("smooth_mask b50",
      jax.vmap(lambda m: smooth_mask_downsampled(m, 100.0, 4)), mask_d)

env = np.broadcast_to(
    (np.exp(-np.linspace(0, 5, n_bins))[:, None]
     * np.ones((1, t_frames)) + 1e-5).astype(np.float32),
    (B, n_bins, t_frames)).copy()
tracks = np.zeros((B, 4, t_frames), np.float32)
knobs_np = {k: (np.broadcast_to(np.float32(v), (B,)).copy()
                if np.isscalar(v)
                else np.broadcast_to(np.asarray(v, np.float32),
                                     (B,) + np.shape(v)).copy())
            for k, v in default_knobs().items()}
keys2 = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
st = SynthStatic(sr=sr, n_fft=n_fft, hop=hop, n=n)
env_d, tracks_d = jax.device_put(env), jax.device_put(tracks)
knobs_d = {k: jax.device_put(v) for k, v in knobs_np.items()}
bench("synth body b50",
      jax.vmap(lambda e, f, m, tr, kn, ky: sum(
          jnp.sum(o) for o in synth_core_impl(st, e, f, m, tr, kn, ky))),
      env_d, f0_d, mask_d, tracks_d, knobs_d, keys2)
