"""Warm-process start: what does a FRESH process pay before its first
heavy phrase render, with the XLA compilation cache already seeded?

The reference's per-process cost is ~seconds of Numba JIT
(ref: GOOFER.py:1224, test.py:6).  Here the persistent XLA cache kills
recompiles but NOT Python tracing + MLIR lowering — the 11-flag phrase
graph is a ~72k-primitive jaxpr and tracing it takes minutes on this
one-core host.  utils/aot.py (the exported-StableHLO store) removes the
trace; this probe measures exactly that delta:

    python tools/probe_warm_start.py          # AOT store on (default)
    GOOFER_TPU_AOT=0 python tools/probe_warm_start.py   # tracing path

Run each in a fresh process (the whole point).  Prints one JSON line
with per-stage seconds:
  import_s        imports + cache setup
  extract_s       one-file voicebank extraction (once per voicebank,
                  NOT per process — separated out because the remote
                  service's mood makes it swing 30-150 s)
  plan_s          host planning of the 80-note phrase (flag decode,
                  pitch tracks, cut/loop plans)
  first_render_s  first heavy phrase render: graph acquire (AOT blob or
                  trace) + executable load (XLA cache or compile) +
                  device compute + fetch.  THE warm-process number.
  second_render_s steady-state (in-process warm) for scale
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    t0 = time.perf_counter()
    from goofer_tpu.cli import _setup_compile_cache

    _setup_compile_cache()
    from bench import _make_voicebank_sample
    from goofer_tpu.sampler.phrase import NoteSpec, plan_phrase, render_phrase

    import_s = time.perf_counter() - t0

    tmp = tempfile.mkdtemp(prefix="goofer_warmstart_")
    src = os.path.join(tmp, "a.wav")
    _make_voicebank_sample(src, 44100)

    # the bench's heavy stack: same flags, same note geometry, so the
    # graphs hit the blobs/executables tools/seed_cache.py --bench wrote
    heavy = "sh30sr30sg40su40sj20st-30vf40es30pd40fw20fsta50"
    scale = ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5", "A3", "G3"]
    notes = [NoteSpec(src, scale[i % 10], length=690, consonant=60,
                      flags=heavy + f"t{(i % 7 - 3) * 10}")
             for i in range(80)]

    t1 = time.perf_counter()
    from goofer_tpu.sampler.resampler import acquire_features
    from pathlib import Path

    acquire_features(Path(src), 1024, 256)   # writes the .goofy
    extract_s = time.perf_counter() - t1

    t1 = time.perf_counter()
    plan_phrase(notes)                       # fills the plan memo
    plan_s = time.perf_counter() - t1

    t1 = time.perf_counter()
    render_phrase(notes, pcm16=True)
    first_s = time.perf_counter() - t1

    t2 = time.perf_counter()
    render_phrase(notes, pcm16=True)
    second_s = time.perf_counter() - t2

    from goofer_tpu.utils import aot

    print(json.dumps({
        "aot": aot.store_dir() is not None,
        "import_s": round(import_s, 2),
        "extract_s": round(extract_s, 2),
        "plan_s": round(plan_s, 2),
        "first_render_s": round(first_s, 2),
        "second_render_s": round(second_s, 2),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
