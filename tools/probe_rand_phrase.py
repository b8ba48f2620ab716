"""Stage breakdown of the randomized-geometry phrase (bench secondary
metric): host planning vs input stacking vs device compute vs d2h fetch,
per bucket group.  Run on the real chip."""
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
    ARRAY_ORDER, NoteSpec, _batched_core, group_planned, plan_phrase,
    render_phrase)
from goofer_tpu.sampler.render_core import default_scalars

sr = 44100
tmp = tempfile.mkdtemp(prefix="goofer_probe_")
src = os.path.join(tmp, "a.wav")
_make_voicebank_sample(src, sr)
scale = ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5", "A3", "G3"]
rng = np.random.default_rng(1)
notes = [NoteSpec(src, scale[int(rng.integers(len(scale)))],
                  length=int(rng.integers(300, 900)), consonant=60,
                  flags=f"t{int(rng.integers(-30, 30))}")
         for _ in range(40)]
audio_sec = sum((n.consonant + n.length) / 1000.0 for n in notes)

t0 = time.perf_counter()
render_phrase(notes, pcm16=True)  # warm
print(f"warmup: {time.perf_counter() - t0:.1f}s", flush=True)

for rep in range(3):
    t0 = time.perf_counter()
    planned, _ = plan_phrase(notes)
    t1 = time.perf_counter()
    groups = group_planned(planned)

    results = []
    t_stack = 0.0
    for (rs, _sk), members in groups.items():
        ts = time.perf_counter()
        b_true = len(members)
        b_pad = config.bucket_batch(b_true) if rs.masked else b_true
        idx = [m.index for m in members] + [0] * (b_pad - b_true)
        keys = np.stack([np.zeros(b_pad, np.uint32),
                         np.asarray(idx, np.uint32)], axis=1)
        axes, stacked = [], []
        for k in ARRAY_ORDER:
            first = members[0].arrays[k]
            if all(m.arrays[k] is first for m in members):
                axes.append(None)
                stacked.append(np.asarray(first))
            else:
                axes.append(0)
                rows = [np.asarray(m.arrays[k]) for m in members]
                rows += [rows[-1]] * (b_pad - b_true)
                stacked.append(np.stack(rows))
        base = default_scalars()
        sc = {}
        for k, dflt in base.items():
            if np.isscalar(dflt):
                vals = np.empty(b_pad, dtype=np.float32)
                for j, m in enumerate(members):
                    vals[j] = m.scalars.get(k, dflt)
                vals[b_true:] = vals[b_true - 1]
                sc[k] = vals
            else:
                rows = [np.asarray(m.scalars.get(k, dflt), np.float32)
                        for m in members]
                rows += [rows[-1]] * (b_pad - b_true)
                sc[k] = np.stack(rows)
        fn = _batched_core(rs, tuple(axes), True)
        out = fn(*stacked, sc, keys)
        max_n = max(int(m.scalars.get("n_true") or rs.n) for m in members)
        out = out[:b_true, :max_n]
        t_stack += time.perf_counter() - ts
        results.append((rs, members, out, b_pad))

    t2 = time.perf_counter()
    for rs, members, out, b_pad in results:
        out.block_until_ready()
    t3 = time.perf_counter()
    nbytes = 0
    for rs, members, out, b_pad in results:
        nbytes += np.asarray(out).nbytes
    t4 = time.perf_counter()
    print(f"rep{rep}: plan {t1 - t0:.3f}s  stack+disp {t_stack:.3f}s  "
          f"compute {t3 - t2:.3f}s  fetch {t4 - t3:.3f}s "
          f"({nbytes / 1e6:.1f}MB, {nbytes / 1e6 / max(t4 - t3, 1e-9):.0f}MB/s)"
          f"  total {t4 - t0:.3f}s -> {audio_sec / (t4 - t0):.0f}x",
          flush=True)
    for rs, members, out, b_pad in results:
        print(f"    group b={len(members)}->{b_pad} n={rs.n} "
              f"out={tuple(out.shape)}", flush=True)
