"""Steady-state breakdown of render_phrase on the bench phrase."""
import os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

cache_dir = os.path.expanduser("~/.cache/goofer_tpu/xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import _make_voicebank_sample
from goofer_tpu.sampler.phrase import NoteSpec, plan_phrase, render_phrase, \
    ARRAY_ORDER, _batched_core, default_scalars
import jax.numpy as jnp

sr = 44100
tmp = tempfile.mkdtemp(prefix="goofer_probe_")
src = os.path.join(tmp, "a.wav")
_make_voicebank_sample(src, sr)
scale = ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5", "A3", "G3"]
notes = []
for i in range(50):
    notes.append(NoteSpec(src, scale[i % len(scale)], length=500,
                          consonant=60, flags=f"t{(i % 7 - 3) * 10}"))
for i in range(47):
    notes.append(NoteSpec(src, scale[(i * 3) % len(scale)], length=750,
                          consonant=60, flags=f"B{(i % 5 - 2) * 10}"))

render_phrase(notes)  # warm everything

for rep in range(3):
    t0 = time.perf_counter()
    planned, _ = plan_phrase(notes)
    t1 = time.perf_counter()

    groups = {}
    for pl in planned:
        shape_key = tuple(np.asarray(pl.arrays[k]).shape for k in ARRAY_ORDER)
        groups.setdefault((pl.rs, shape_key), []).append(pl)
    t2 = time.perf_counter()

    t_stack = t_disp = t_fetch = 0.0
    outs = [None] * len(planned)
    master = jax.random.PRNGKey(0)
    for (rs, _sk), members in groups.items():
        ts = time.perf_counter()
        keys = jax.random.split(jax.random.fold_in(master, members[0].index),
                                len(members))
        axes, stacked = [], []
        for k in ARRAY_ORDER:
            first = members[0].arrays[k]
            if all(m.arrays[k] is first for m in members):
                axes.append(None); stacked.append(jnp.asarray(np.asarray(first)))
            else:
                axes.append(0)
                stacked.append(jnp.asarray(np.stack(
                    [np.asarray(m.arrays[k]) for m in members])))
        base = default_scalars()
        sc = {k: jnp.asarray(np.stack(
            [np.asarray(m.scalars.get(k, base[k]), dtype=np.float32)
             for m in members])) for k in base}
        td = time.perf_counter(); t_stack += td - ts
        fn = _batched_core(rs, tuple(axes))
        result = fn(*stacked, sc, keys)
        jax.block_until_ready(result)
        tf = time.perf_counter(); t_disp += tf - td
        result = np.asarray(result)
        t_fetch += time.perf_counter() - tf
    print(f"rep{rep}: plan={t1-t0:6.3f}s group={t2-t1:6.3f}s "
          f"stack+h2d={t_stack:6.3f}s dispatch={t_disp:6.3f}s "
          f"fetch={t_fetch:6.3f}s", flush=True)
