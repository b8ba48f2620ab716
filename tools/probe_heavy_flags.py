"""Wall time of flag-rich note renders on the chip (subharm, sub-octave,
growl, tension, fry, roughness paths) — the bench phrase only exercises
t/B.  Warm reps, full fetch."""
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
from goofer_tpu.sampler.phrase import NoteSpec, render_phrase

sr = 44100
tmp = tempfile.mkdtemp(prefix="goofer_probe_")
src = os.path.join(tmp, "a.wav")
_make_voicebank_sample(src, sr)

CASES = {
    "texture (sh sr sg br)": "sh40sr40sg60br30",
    "layers (su sj sa)": "su50sj30sa30",
    "tension+fry (st vf vh)": "st40vf60vh45",
    "full stack": "sh30sr30sg40su40sj20st-30vf40es30pd40fw20fsta50",
}

for name, flags in CASES.items():
    notes = [NoteSpec(src, "C4", length=500, consonant=60, flags=flags)
             for _ in range(8)]
    audio = sum((n.consonant + n.length) / 1000.0 for n in notes)
    t0 = time.perf_counter()
    outs = render_phrase(notes, pcm16=True)
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = render_phrase(notes, pcm16=True)
        best = min(best, time.perf_counter() - t0)
    assert all(np.abs(o).max() > 0 for o in outs)
    print(f"{name:28s} warmup {warm:6.1f}s   steady {best * 1e3:6.0f} ms "
          f"({audio / best:5.1f}x realtime, 8 notes)", flush=True)
