"""Break pulse_train (b50, n=24696) into stages on the real chip:
prefix ops (cumsum/cummax/onsets), compact-table scatters, blocked
accumulate, and the full blocked vs Pallas vs per-sample paths."""
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

from goofer_tpu import config
from goofer_tpu.ops.pulse import (
    _accumulate_pulses_blocked, _compact_onset_tables, _onsets_from_phase,
    forward_fill, pulse_train)

B, n, sr = 50, 24696, 44100.0
rng = np.random.default_rng(0)
f0 = np.full((B, n), 220.0, np.float32)
f0 += rng.standard_normal((B, n)).astype(np.float32)  # break uniformity
f0[:, : n // 8] = 0.0
f0_d = jax.device_put(f0)
jax.block_until_ready(f0_d)


def bench(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"{name:46s} med {np.median(times) * 1e3:8.2f} ms   "
          f"min {min(times) * 1e3:8.2f} ms", flush=True)
    return out


Ra, Rg, Rk = config.PULSE_RA, config.PULSE_RG, config.PULSE_RK


def prefix(f):
    f0v = forward_fill(f, f > 1e-6, config.PULSE_FALLBACK_F0)
    phase = jnp.cumsum(f / sr)
    onset = _onsets_from_phase(phase)
    T = 1.0 / jnp.maximum(f0v, 1e-6)
    T0 = jnp.clip(jnp.round(sr * T), config.PULSE_T0_MIN,
                  config.PULSE_T0_MAX)
    return onset, T0, T


bench("prefix (ffill+cumsum+onset)",
      jax.jit(jax.vmap(prefix)), f0_d)

onset, T0, T = jax.jit(jax.vmap(prefix))(f0_d)
jax.block_until_ready((onset, T0, T))

bench("compact tables (4 scatters)",
      jax.jit(jax.vmap(lambda o, a, b: _compact_onset_tables(
          n, o, a, b, Ra, Rg, Rk, True, 16))), onset, T0, T)

bench("blocked accumulate (incl tables)",
      jax.jit(jax.vmap(lambda o, a, b: _accumulate_pulses_blocked(
          n, o, a, b, Ra, Rg, Rk, True, 8))), onset, T0, T)

bench("pulse_train blocked (full)",
      jax.jit(jax.vmap(lambda f: pulse_train(f, sr))), f0_d)

bench("pulse_train pallas (full)",
      jax.jit(jax.vmap(lambda f: pulse_train(f, sr, use_pallas=True))), f0_d)

# equivalence check blocked vs pallas
a = jax.jit(jax.vmap(lambda f: pulse_train(f, sr)))(f0_d)
b = jax.jit(jax.vmap(lambda f: pulse_train(f, sr, use_pallas=True)))(f0_d)
d = jnp.max(jnp.abs(a - b))
print("blocked-vs-pallas max abs diff:", np.asarray(jax.device_get(d)),
      flush=True)
