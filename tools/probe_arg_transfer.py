"""Quantify per-dispatch argument-transfer cost in the real render:
full fused render + FULL PCM fetch, with (a) fresh numpy args each call
(what render_phrase does), (b) pre-device_put args.  The difference is
the h2d/arg-handling tax that scalar-packing would remove."""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

cache_dir = os.path.expanduser("~/.cache/goofer_tpu/xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import _make_voicebank_sample
from goofer_tpu import config
from goofer_tpu.sampler.phrase import (
    ARRAY_ORDER, NoteSpec, _batched_core, group_planned, plan_phrase)
from goofer_tpu.sampler.render_core import default_scalars

sr = 44100
tmp = tempfile.mkdtemp(prefix="goofer_probe_")
src = os.path.join(tmp, "a.wav")
_make_voicebank_sample(src, sr)
scale = ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5", "A3", "G3"]
notes = [NoteSpec(src, scale[i % len(scale)], length=500, consonant=60,
                  flags=f"t{(i % 7 - 3) * 10}") for i in range(50)]
planned, _ = plan_phrase(notes)
groups = group_planned(planned)
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
n_bufs = len(stacked_np) + len(sc_np) + 1
print(f"b={b} n={rs.n} arg buffers={n_bufs}", flush=True)

_ = np.asarray(fn(*stacked_np, sc_np, keys_np))           # warm


def timed(tag, call, reps=8):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = call()
        _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    print(f"{tag:34s} med {np.median(ts) * 1e3:7.1f} ms  "
          f"min {min(ts) * 1e3:7.1f} ms", flush=True)


timed("numpy args (fresh each call)",
      lambda: fn(*[a.copy() for a in stacked_np],
                 {k: v.copy() for k, v in sc_np.items()}, keys_np.copy()))
timed("numpy args (same objects)", lambda: fn(*stacked_np, sc_np, keys_np))

stacked_d = [jax.device_put(a) for a in stacked_np]
sc_d = {k: jax.device_put(v) for k, v in sc_np.items()}
keys_d = jax.device_put(keys_np)
_ = np.asarray(fn(*stacked_d, sc_d, keys_d))
timed("device-resident args", lambda: fn(*stacked_d, sc_d, keys_d))
