"""Attribute the 11-flag-stack phrase cost to flag groups (VERDICT r1
item 2 follow-up): time the 80-note 60 s heavy phrase with one flag
group removed at a time.  Steady-state best-of-3 per config.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

os.environ.setdefault("GOOFER_TPU_CACHE",
                      os.path.expanduser("~/.cache/goofer_tpu/xla"))
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["GOOFER_TPU_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import _make_voicebank_sample  # noqa: E402
from goofer_tpu.sampler.phrase import NoteSpec, render_phrase  # noqa: E402

SR = 44100
SCALE = ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5", "A3", "G3"]

CONFIGS = {
    "full stack": "sh30sr30sg40su40sj20st-30vf40es30pd40fw20fsta50",
    "-sh-sr (jitters)": "sg40su40sj20st-30vf40es30pd40fw20fsta50",
    "-sg (subharm pulses)": "sh30sr30su40sj20st-30vf40es30pd40fw20fsta50",
    "-su (sub-octave layer)": "sh30sr30sg40sj20st-30vf40es30pd40fw20fsta50",
    "-sj (growl layer)": "sh30sr30sg40su40st-30vf40es30pd40fw20fsta50",
    "-st (tension)": "sh30sr30sg40su40sj20vf40es30pd40fw20fsta50",
    "-vf (fry)": "sh30sr30sg40su40sj20st-30es30pd40fw20fsta50",
    "-es-fw-pd-fsta (env fx)": "sh30sr30sg40su40sj20st-30vf40",
    "none (t only)": "",
}


def main():
    tmp = tempfile.mkdtemp(prefix="goofer_heavy_")
    src = os.path.join(tmp, "a.wav")
    _make_voicebank_sample(src, SR)

    for name, flags in CONFIGS.items():
        notes = [NoteSpec(src, SCALE[i % len(SCALE)], length=690,
                          consonant=60,
                          flags=flags + f"t{(i % 7 - 3) * 10}")
                 for i in range(80)]
        audio = sum((n.consonant + n.length) / 1000.0 for n in notes)
        t0 = time.perf_counter()
        render_phrase(notes, pcm16=True)
        warm = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = render_phrase(notes, pcm16=True)
            best = min(best, time.perf_counter() - t0)
        assert all(np.abs(o).max() > 0 for o in outs)
        print(f"{name:28s} {best*1e3:7.1f} ms  {audio/best:6.1f}x rt   "
              f"(warm {warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
