"""Executable-size + cost-analysis breakdown of the heavy 11-flag phrase
graphs (VERDICT r4 item 2 / item 8 evidence).

For each geometry group of an 80-note full-flag phrase, lowers and
compiles the production `_batched_core` graph and prints XLA's
memory_analysis (generated code size = what the axon tunnel must upload
on a warm-process cache HIT) and cost_analysis (flops / bytes accessed
-> the HBM roofline in docs/PERFORMANCE.md "Roofline" section).

Run on the real chip; needs ~3 min for the two compiles (cached after).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GOOFER_TPU_AOT"] = "0"

import numpy as np
import jax

cache_dir = os.path.expanduser("~/.cache/goofer_tpu/xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import _make_voicebank_sample
from goofer_tpu import config
from goofer_tpu.sampler.phrase import (ARRAY_ORDER, NoteSpec, _batched_core,
                                       group_planned, plan_phrase)
from goofer_tpu.sampler.render_core import default_scalars

sr = 44100
tmp = tempfile.mkdtemp(prefix="goofer_probe_")
src = os.path.join(tmp, "a.wav")
_make_voicebank_sample(src, sr)
heavy = "sh30sr30sg40su40sj20st-30vf40es30pd40fw20fsta50"
scale = ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5", "A3", "G3"]
notes = [NoteSpec(src, scale[i % 10], length=690, consonant=60,
                  flags=heavy + f"t{(i % 7 - 3) * 10}") for i in range(80)]
planned, _ = plan_phrase(notes)
groups = group_planned(planned)
print("n groups:", len(groups))
for (rs, sk), members in groups.items():
    b_true = len(members)
    b_pad = config.bucket_batch(b_true) if rs.masked else b_true
    print("group b=", b_true, "pad", b_pad, "n", rs.n, "masked", rs.masked)
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
    keys = np.stack([np.zeros(b_pad, np.uint32),
                     np.arange(b_pad, dtype=np.uint32)], axis=1)
    fn = _batched_core(rs, tuple(axes), True)
    t0 = time.perf_counter()
    lowered = fn.lower(*stacked, sc, keys)
    print("  lower: %.1fs" % (time.perf_counter() - t0), flush=True)
    t0 = time.perf_counter()
    comp = lowered.compile()
    print("  compile(+cache load): %.1fs" % (time.perf_counter() - t0),
          flush=True)
    try:
        ma = comp.memory_analysis()
        print("  generated_code  %.2f MB" %
              (ma.generated_code_size_in_bytes / 1e6))
        print("  args %.2f MB  out %.2f MB  temp %.2f MB" %
              (ma.argument_size_in_bytes / 1e6,
               ma.output_size_in_bytes / 1e6,
               ma.temp_size_in_bytes / 1e6))
    except Exception as e:  # noqa: BLE001 - probe prints whatever it can
        print("  memory_analysis failed:", e)
    try:
        ca = comp.cost_analysis()
        keysel = {k: v for k, v in sorted(ca.items()) if k in
                  ("flops", "bytes accessed", "optimal_seconds",
                   "transcendentals")}
        print("  cost:", keysel)
    except Exception as e:  # noqa: BLE001
        print("  cost_analysis failed:", e)
