"""Feature-extraction throughput on the chip: single file, and the
bucketed batch path (folder extraction), honest fetch-timed."""
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
from goofer_tpu.analysis.features import extract_features
from goofer_tpu.utils.audio_io import read_wav_mono

sr = 44100
tmp = tempfile.mkdtemp(prefix="goofer_probe_")
paths = []
for i, dur in enumerate((0.6, 0.8, 1.1, 1.5)):
    p = os.path.join(tmp, f"s{i}.wav")
    _make_voicebank_sample(p, sr, dur=dur)
    paths.append(p)

ys = [read_wav_mono(p)[0] for p in paths]

t0 = time.perf_counter()
out = extract_features(ys[0], sr, n_fft=1024, hop_length=256)
_ = [np.asarray(o) for o in out[:3]]
print(f"first extract (0.6 s file): {time.perf_counter() - t0:.2f}s",
      flush=True)

for rep in range(4):
    t0 = time.perf_counter()
    out = extract_features(ys[0], sr, n_fft=1024, hop_length=256)
    _ = [np.asarray(o) for o in out[:3]]
    dt = time.perf_counter() - t0
    print(f"warm extract rep{rep}: {dt * 1e3:.0f} ms "
          f"({0.6 / dt:.0f}x realtime)", flush=True)

# batch path over 4 distinct lengths
from goofer_tpu.sampler.batch_extract import extract_features_recursive

t0 = time.perf_counter()
n_done = extract_features_recursive(tmp, n_fft=1024, hop=256)
print(f"folder extract 4 files (cold graphs for buckets): "
      f"{time.perf_counter() - t0:.1f}s -> {n_done}", flush=True)
for p in paths:
    g = p.rsplit(".", 1)[0] + "_features.goofy"
    os.path.exists(g) and os.remove(g)
t0 = time.perf_counter()
n_done = extract_features_recursive(tmp, n_fft=1024, hop=256)
dt = time.perf_counter() - t0
total = sum((0.6, 0.8, 1.1, 1.5))
print(f"folder extract 4 files warm: {dt:.2f}s "
      f"({total / dt:.0f}x realtime)", flush=True)

# voicebank scale: 64 files across a few length buckets, 16-file chunks
# (the production folder-extraction shape; VERDICT r3 item 6 target:
# >=100x realtime warm)
durs = [0.6, 0.8, 1.1, 1.5, 2.0, 2.4] * 11  # 66 files
vb = os.path.join(tmp, "vb")
os.makedirs(vb, exist_ok=True)
for i, d in enumerate(durs):
    _make_voicebank_sample(os.path.join(vb, f"f{i:03d}.wav"), sr, dur=d)

t0 = time.perf_counter()
n_done = extract_features_recursive(vb, n_fft=1024, hop=256)
print(f"voicebank extract {n_done} files (cold buckets): "
      f"{time.perf_counter() - t0:.1f}s", flush=True)
for f in os.listdir(vb):
    if f.endswith(".goofy"):
        os.remove(os.path.join(vb, f))
t0 = time.perf_counter()
n_done = extract_features_recursive(vb, n_fft=1024, hop=256)
dt = time.perf_counter() - t0
total = sum(durs)
print(f"voicebank extract {n_done} files warm: {dt:.2f}s "
      f"({total / dt:.0f}x realtime, {total:.1f}s audio)", flush=True)
