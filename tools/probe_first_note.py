"""Time-to-first-note probe (VERDICT r2 item 2).

A warmed reference renders ANY flag string at full speed (its numba
warmup is one-time, ref GOOFER.py:1224); BENCH_r02 measured 141 s for
this build's first sight of the 11-flag stack.  This probe measures the
bridge: after warm_universal(), a never-seen flag combo must render in
~one dispatch through the covering universal graph while its
specialized graph compiles in the background.

Prints: universal warmup time (once per process/persistent-cache),
first-request latency for several UNSEEN flag strings, the same
request's steady-state latency after the background compile lands, and
universal-vs-specialized parity on the rendered audio.
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

from pathlib import Path  # noqa: E402

from bench import _make_voicebank_sample  # noqa: E402
from goofer_tpu.io.goofy import formants_to_int_keys  # noqa: E402
from goofer_tpu.sampler import resampler as rsm  # noqa: E402

SR = 44100

# flag strings the process has NEVER rendered (each a distinct graph
# signature family, incl. the 11-flag stack shape from BENCH)
UNSEEN = [
    "sh30sr30sg40su40sj20st-30vf40es30pd40fw20fsta50",
    "st-65es-25su45fa12fb-9",
    "sj35sd40sa30pd-30B70g25",
]


def main():
    tmp = tempfile.mkdtemp(prefix="goofer_firstnote_")
    src = os.path.join(tmp, "src.wav")
    _make_voicebank_sample(src, SR)

    # feature extraction (not the subject here)
    env, f0i, vmask, forms, sr, ylen = rsm.acquire_features(
        Path(src), 1024, 256)
    forms = formants_to_int_keys(forms)

    t0 = time.perf_counter()
    n = rsm.warm_universal(sr=SR)
    print(f"warm_universal: {n} graphs in {time.perf_counter()-t0:.1f}s",
          flush=True)

    for flags in UNSEEN:
        r = rsm.GooferResampler(
            src, os.path.join(tmp, "out.wav"), "C4", 100, flags,
            0, 650, 60, 0, 100, 0, "!120", "ABAC#3#AD",
            autorender=False)
        t0 = time.perf_counter()
        out = np.asarray(r.resample(env, f0i, vmask, forms, sr, ylen))
        first = time.perf_counter() - t0
        audio_s = len(out) / SR
        print(f"{flags[:28]:30s} first request {first*1e3:8.1f} ms "
              f"({audio_s/first:6.1f}x rt)", flush=True)

        # wait for the background specialized compile, then steady state
        rs, arrays, scalars = r.prepare(env, f0i, vmask, forms, sr, ylen)
        deadline = time.time() + 600
        while rs not in rsm._seen_statics and time.time() < deadline:
            time.sleep(0.5)
        assert rs in rsm._seen_statics, "background compile never landed"
        t0 = time.perf_counter()
        spec = np.asarray(r.resample(env, f0i, vmask, forms, sr, ylen))
        steady = time.perf_counter() - t0
        # parity metric: LSD, not waveform correlation — the universal
        # render runs at the promoted bucket length, so the UNSEEDED-
        # RANDOM jitters (reference semantics: a different realization
        # every render) draw differently than the specialized graph;
        # the spectral envelope is what must match.
        from goofer_tpu.utils.metrics import lsd_db

        lsd = lsd_db(out[: len(spec)], spec, SR)
        rel = (np.linalg.norm(out[: len(spec)] - spec)
               / (np.linalg.norm(spec) + 1e-12))
        print(f"{'':30s} steady        {steady*1e3:8.1f} ms "
              f"({audio_s/steady:6.1f}x rt)   universal-vs-spec "
              f"lsd={lsd:.2f}dB rel={rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
