"""Per-stage breakdown of the bucketed randomized-length phrase on TPU."""
import os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax

cache_dir = os.path.expanduser("~/.cache/goofer_tpu/xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import _make_voicebank_sample
from goofer_tpu.sampler.phrase import NoteSpec, render_phrase, plan_phrase

sr = 44100
tmp = tempfile.mkdtemp(); src = os.path.join(tmp, "a.wav")
_make_voicebank_sample(src, sr)
scale = ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5", "A3", "G3"]
rng = np.random.default_rng(1)
notes = [NoteSpec(src, scale[int(rng.integers(len(scale)))],
                  length=int(rng.integers(300, 900)), consonant=60,
                  flags=f"t{int(rng.integers(-30, 30))}")
         for _ in range(40)]
audio = sum((n.consonant + n.length) / 1000.0 for n in notes)

render_phrase(notes, pcm16=True)  # warm
# stage breakdown
for rep in range(3):
    t0 = time.perf_counter()
    planned, _ = plan_phrase(notes)
    t1 = time.perf_counter()
    outs = render_phrase(notes, pcm16=True)
    t2 = time.perf_counter()
    print(f"rep{rep}: plan={t1-t0:.3f}s total_render={t2-t1:.3f}s "
          f"(incl re-plan) -> {audio/(t2-t1):.1f}x", flush=True)

# group stats
from goofer_tpu.sampler.phrase import _shape_key
groups = {}
for pl_ in planned:
    groups.setdefault((pl_.rs, _shape_key(pl_)), []).append(pl_)
print("groups:", [(g[0].rs.n, len(g)) for g in
                  [v for v in groups.values()]])
