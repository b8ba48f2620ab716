"""Time the FULL fused render graph (bench geometry, batch 50) with
device-resident inputs vs numpy inputs, plus the synth body and
pulse_train alone — separates h2d transfer from device compute."""
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
from goofer_tpu.ops.pulse import pulse_train
from goofer_tpu.sampler.phrase import (
    ARRAY_ORDER, NoteSpec, _batched_core, _shape_key, plan_phrase)
from goofer_tpu.sampler.render_core import default_scalars


def bench(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"{name:44s} med {np.median(times) * 1e3:8.2f} ms   "
          f"min {min(times) * 1e3:8.2f} ms", flush=True)


# ---- build the real bench group (batch 50) ------------------------------
sr = 44100
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
nbytes = 0
for k in ARRAY_ORDER:
    first = members[0].arrays[k]
    if all(m.arrays[k] is first for m in members):
        axes.append(None)
        stacked_np.append(np.asarray(first))
    else:
        axes.append(0)
        stacked_np.append(np.stack([np.asarray(m.arrays[k])
                                    for m in members]))
    nbytes += stacked_np[-1].nbytes
base = default_scalars()
sc_np = {}
for k, dflt in base.items():
    if np.isscalar(dflt):
        sc_np[k] = np.asarray([m.scalars.get(k, dflt) for m in members],
                              np.float32)
    else:
        sc_np[k] = np.stack([np.asarray(m.scalars.get(k, dflt), np.float32)
                             for m in members])
    nbytes += sc_np[k].nbytes
print(f"group b={b} n={rs.n} input bytes={nbytes / 1e6:.1f}MB", flush=True)

fn = _batched_core(rs, tuple(axes), True)

bench("fused render b50 (numpy inputs)", fn, *stacked_np, sc_np, keys_np)

stacked_dev = [jax.device_put(a) for a in stacked_np]
sc_dev = {k: jax.device_put(v) for k, v in sc_np.items()}
keys_dev = jax.device_put(keys_np)
jax.block_until_ready((stacked_dev, sc_dev, keys_dev))
bench("fused render b50 (device inputs)", fn, *stacked_dev, sc_dev, keys_dev)

# ---- synth body alone, device inputs ------------------------------------
B, n, n_fft, hop = 50, rs.n, 1024, 256
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
knobs_np = {k: (np.broadcast_to(np.float32(v), (B,)).copy()
                if np.isscalar(v)
                else np.broadcast_to(np.asarray(v, np.float32),
                                     (B,) + np.shape(v)).copy())
            for k, v in default_knobs().items()}
keys2 = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
st = SynthStatic(sr=sr, n_fft=n_fft, hop=hop, n=n)
body = jax.jit(jax.vmap(
    lambda e, f, m, tr, kn, ky: synth_core_impl(st, e, f, m, tr, kn, ky)))
env_d, f0_d, mask_d, tracks_d = map(jax.device_put, (env, f0, mask, tracks))
knobs_d = {k: jax.device_put(v) for k, v in knobs_np.items()}
jax.block_until_ready((env_d, f0_d, mask_d, tracks_d, knobs_d))
bench("synth body b50 (device inputs)",
      body, env_d, f0_d, mask_d, tracks_d, knobs_d, keys2)

pt = jax.jit(jax.vmap(lambda f: pulse_train(f, sr)))
bench("pulse_train b50 (device inputs)", pt, f0_d)

# ---- raw h2d cost of the group inputs ------------------------------------
t0 = time.perf_counter()
for _ in range(5):
    moved = [jax.device_put(a) for a in stacked_np]
    jax.block_until_ready(moved)
dt = (time.perf_counter() - t0) / 5
print(f"h2d of group arrays ({nbytes / 1e6:.1f}MB): {dt * 1e3:.1f} ms = "
      f"{nbytes / 1e6 / dt:.0f}MB/s", flush=True)
