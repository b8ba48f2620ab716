"""block_until_ready does not wait on this backend — the only honest
timer fetches data.  Re-measure with a 1-element device_get per rep:
RTT baseline, matmul chains (sanity), pulse_train, synth body, fused
render, and the istft/blur suspects."""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

cache_dir = os.path.expanduser("~/.cache/goofer_tpu/xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import _make_voicebank_sample
from goofer_tpu.engine.synth import SynthStatic, default_knobs, synth_core_impl
from goofer_tpu.ops.filters import gaussian_blur1d
from goofer_tpu.ops.pulse import pulse_train
from goofer_tpu.ops.stft import istft, stft
from goofer_tpu.sampler.phrase import (
    ARRAY_ORDER, NoteSpec, _batched_core, _shape_key, plan_phrase)
from goofer_tpu.sampler.render_core import default_scalars


def first_elem(out):
    x = out
    while isinstance(x, (tuple, list, dict)):
        x = x[0] if not isinstance(x, dict) else next(iter(x.values()))
    return x


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    _ = np.asarray(jax.device_get(first_elem(out).ravel()[0]))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.device_get(first_elem(out).ravel()[0]))
        times.append(time.perf_counter() - t0)
    print(f"{name:44s} med {np.median(times) * 1e3:8.2f} ms   "
          f"min {min(times) * 1e3:8.2f} ms", flush=True)


rng = np.random.default_rng(0)

ident = jax.jit(lambda x: x + 1.0)
tiny = jax.device_put(np.zeros(8, np.float32))
bench("RTT baseline (x+1, fetch 1 elem)", ident, tiny, reps=20)

A = jax.device_put(rng.standard_normal((2048, 2048)).astype(np.float32))


def chain(a, iters):
    return jax.lax.fori_loop(0, iters, lambda _, x: x @ x * 1e-4, a)


bench("matmul 2048^2 x10 (0.17 TFLOP)",
      jax.jit(lambda a: chain(a, 10)), A, reps=5)
bench("matmul 2048^2 x100 (1.7 TFLOP)",
      jax.jit(lambda a: chain(a, 100)), A, reps=5)

B, n, sr, n_fft, hop = 50, 24696, 44100, 1024, 256
n_bins = n_fft // 2 + 1
t_frames = 1 + n // hop
f0 = np.full((B, n), 220.0, np.float32)
f0[:, : n // 8] = 0.0
f0_d = jax.device_put(f0)
bench("pulse_train b50", jax.jit(jax.vmap(lambda f: pulse_train(f, sr))),
      f0_d)

S1 = jax.device_put((rng.standard_normal((B, n_bins, t_frames))
                     + 1j * rng.standard_normal((B, n_bins, t_frames))
                     ).astype(np.complex64))
bench("istft b50", jax.jit(jax.vmap(lambda s: istft(s, hop, length=n))), S1)
E = jax.device_put(
    rng.standard_normal((B, n_bins, t_frames)).astype(np.float32))
bench("freq blur s1.75 b50",
      jax.jit(jax.vmap(lambda e: gaussian_blur1d(e, 1.75, axis=0))), E)

mask = (f0 > 75).astype(np.float32)
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
body = jax.jit(jax.vmap(
    lambda e, f, m, tr, kn, ky: synth_core_impl(st, e, f, m, tr, kn, ky)))
args_d = [jax.device_put(a) for a in (env, f0, mask, tracks)]
knobs_d = {k: jax.device_put(v) for k, v in knobs_np.items()}
bench("synth body b50", body, *args_d, knobs_d, keys2)

# real bench group through the fused render
tmp = tempfile.mkdtemp(prefix="goofer_probe_")
src = os.path.join(tmp, "a.wav")
_make_voicebank_sample(src, sr)
scale = ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5", "A3", "G3"]
notes = [NoteSpec(src, scale[i % len(scale)], length=500, consonant=60,
                  flags=f"t{(i % 7 - 3) * 10}") for i in range(50)]
planned, _ = plan_phrase(notes)
groups = {}
for pl in planned:
    groups.setdefault((pl.rs, _shape_key(pl)), []).append(pl)
(rs, _sk), members = next(iter(groups.items()))
b = len(members)
keys_np = np.stack([np.zeros(b, np.uint32),
                    np.arange(b, dtype=np.uint32)], axis=1)
axes, stacked_np = [], []
for k in ARRAY_ORDER:
    first = members[0].arrays[k]
    if all(m.arrays[k] is first for m in members):
        axes.append(None)
        stacked_np.append(np.asarray(first))
    else:
        axes.append(0)
        stacked_np.append(np.stack([np.asarray(m.arrays[k])
                                    for m in members]))
base = default_scalars()
sc_np = {}
for k, dflt in base.items():
    if np.isscalar(dflt):
        sc_np[k] = np.asarray([m.scalars.get(k, dflt) for m in members],
                              np.float32)
    else:
        sc_np[k] = np.stack([np.asarray(m.scalars.get(k, dflt), np.float32)
                             for m in members])
fn = _batched_core(rs, tuple(axes), True)
bench("fused render b50 (numpy args)", fn, *stacked_np, sc_np, keys_np)
stacked_d = [jax.device_put(a) for a in stacked_np]
sc_d = {k: jax.device_put(v) for k, v in sc_np.items()}
keys_d = jax.device_put(keys_np)
bench("fused render b50 (device args)", fn, *stacked_d, sc_d, keys_d)

# full-output fetch for reference (the real bench cost)
out = fn(*stacked_np, sc_np, keys_np)
t0 = time.perf_counter()
for _ in range(3):
    out = fn(*stacked_np, sc_np, keys_np)
    _ = np.asarray(out)
print(f"fused render + FULL fetch ({np.asarray(out).nbytes / 1e6:.1f}MB): "
      f"{(time.perf_counter() - t0) / 3 * 1e3:.1f} ms", flush=True)
