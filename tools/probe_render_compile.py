import os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from bench import _make_voicebank_sample
from goofer_tpu.sampler.phrase import NoteSpec, plan_phrase, ARRAY_ORDER, _batched_core
from goofer_tpu.sampler.phrase import default_scalars

sr = 44100
tmp = tempfile.mkdtemp(); src = os.path.join(tmp, "a.wav")
_make_voicebank_sample(src, sr)
# warm the service with a trivial compile
jax.jit(lambda x: x + 1).lower(np.zeros(8, np.float32)).compile()

notes = [NoteSpec(src, "C4", length=500, consonant=60, flags="t10")] * 63
t0 = time.perf_counter()
planned, _ = plan_phrase(notes, bucket=False)
print(f"plan(+extract): {time.perf_counter()-t0:.1f}s", flush=True)

pl0 = planned[0]
import jax.numpy as jnp
axes, stacked = [], []
for k in ARRAY_ORDER:
    first = pl0.arrays[k]
    if all(p.arrays[k] is first for p in planned):
        axes.append(None); stacked.append(np.asarray(first))
    else:
        axes.append(0); stacked.append(np.stack([np.asarray(p.arrays[k]) for p in planned]))
base = default_scalars()
sc = {k: np.stack([np.asarray(p.scalars.get(k, base[k]), dtype=np.float32) for p in planned]) for k in base}
keys = np.zeros((63, 2), np.uint32)
fn = _batched_core(pl0.rs, tuple(axes))
t0 = time.perf_counter()
c = fn.lower(*stacked, sc, keys).compile()
print(f"vmapped render graph (B=63) compile: {time.perf_counter()-t0:.1f}s", flush=True)
r = fn(*stacked, sc, keys); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(5):
    r = fn(*stacked, sc, keys)
jax.block_until_ready(r)
print(f"run: {(time.perf_counter()-t0)/5*1e3:.1f}ms", flush=True)
