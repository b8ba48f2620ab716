"""Generate golden parity artifacts for the 5 BASELINE configs.

Two modes:

* ``--mode repo`` (default): renders through THIS repo's production
  pipeline on the virtual CPU platform with a pinned seed, freezing
  today's validated behavior into committed artifacts
  (tests/golden/repo/).  Guards against regression drift; op-level
  reference parity is covered separately by the restated-oracle tests
  (see PARITY.md).
* ``--mode reference``: renders the SAME configs through the true
  upstream resampler (``python SillySampler.py`` with its 13-arg CLI).
  Requires an environment with the reference's deps (numba,
  praat-parselmouth, soundfile) — not available in this image.  Outputs
  land in tests/golden/ref/, which the golden tests prefer when present.

Artifacts per config: out_<name>.wav.  Plus the deterministic source
sample (src.wav) and its .goofy.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# (name, pitch, velocity, flags, offset, length, consonant, cutoff,
#  volume, modulation, tempo, pitch_string) — the 5 BASELINE.json configs
CONFIGS = [
    ("neutral", "C4", 100, "", 0, 500, 60, 0, 100, 0, "!120", "AA"),
    ("loops_l0", "D4", 100, "t30L0", 0, 900, 60, 0, 100, 0, "!120", "AA"),
    ("loops_l1", "D4", 100, "t-25L1", 0, 900, 60, 0, 100, 0, "!120", "AA"),
    ("loops_l2_rev", "D4", 100, "L2R", 0, 900, 60, 0, 100, 0, "!120", "AA"),
    ("formant_chain", "C4", 100, "g-15fa8fb-6fw25br30es20", 0, 500, 60,
     0, 100, 0, "!120", "AA"),
    ("texture", "E4", 100, "V70B45U-30sh40sr35sd25su40sg20", 0, 500, 60,
     0, 100, 0, "!120", "AA"),
    ("fry_full", "A3", 100, "vf35vh55vl30st-25sa25", 0, 700, 60,
     0, 100, 0, "!120", "ABAC#3#AD"),
]


def make_source(path: Path, sr: int = 44100) -> None:
    import numpy as np

    from goofer_tpu.utils.audio_io import write_wav

    n = int(0.6 * sr)
    t = np.arange(n) / sr
    f0 = 220.0 * (1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t))
    phase = np.cumsum(f0 / sr)
    y = 0.35 * (2 * (phase % 1.0) - 1.0)
    y = np.convolve(y, np.ones(8) / 8.0, mode="same")
    rng = np.random.default_rng(0)
    y[: n // 10] = 0.05 * rng.standard_normal(n // 10)
    write_wav(path, y.astype(np.float32), sr)


def gen_repo(out_dir: Path) -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from goofer_tpu.sampler.resampler import GooferResampler

    out_dir.mkdir(parents=True, exist_ok=True)
    src = out_dir / "src.wav"
    make_source(src)
    for name, *args in CONFIGS:
        out = out_dir / f"out_{name}.wav"
        GooferResampler(str(src), str(out), *args, seed=0)
        print(f"[golden] {out.name}")
    print(f"[golden] {out_dir / 'src_features.goofy'}")


def gen_reference(out_dir: Path, reference: Path) -> None:
    """Render the CONFIGS through the TRUE upstream resampler in-process
    (tests/ref_harness.py stubs numba/soundfile/sounddevice), with the
    RNG pinned to seed 0 so the stochastic flag families freeze.

    The .goofy features are extracted by THIS repo and shared by both
    sides: upstream extraction needs parselmouth (absent in this image),
    and the golden suite pins RENDER parity — feature-extraction parity
    is carried by tests/test_analysis.py and the Praat-track fixture."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import numpy as np

    from tests import oracles as o
    from tests.ref_harness import load_reference, render_reference
    from goofer_tpu.sampler.resampler import GooferResampler

    out_dir.mkdir(parents=True, exist_ok=True)
    src = out_dir / "src.wav"
    make_source(src)
    # one production render to populate src_features.goofy next to src
    scratch = out_dir / "_warm.wav"
    GooferResampler(str(src), str(scratch), *CONFIGS[0][1:], seed=0)
    scratch.unlink()
    assert (out_dir / "src_features.goofy").exists()

    # The numba stub runs pulse_train_numba's phase accumulator in f32
    # (NumPy weak promotion) where REAL numba promotes it to f64
    # (GOOFER.py:479-491) — and the global max-|S| harmonic
    # normalization is sensitive to pulse alignment, so the f32-phase
    # stub render can sit a whole dB from the real reference.  Goldens
    # must represent the REAL reference: substitute the oracle's
    # f64-phase restatement, which tests/test_ref_upstream.py certifies
    # float-exact against the upstream kernel modulo that dtype.
    gf = load_reference()[0]
    orig_pt = gf.pulse_train_numba
    gf.pulse_train_numba = lambda f0, sr, Ra=0.02, Rg=1.7, Rk=0.8: \
        o.o_pulse_train(f0, sr, Ra, Rg, Rk).astype(np.float32)
    try:
        for name, *args in CONFIGS:
            out = out_dir / f"out_{name}.wav"
            render_reference(src, out, *args, seed=0, capture=False)
            print(f"[golden-ref] {out.name}")
    finally:
        gf.pulse_train_numba = orig_pt
    dump_praat_tracks(out_dir, src)


# Real-voice configs (VERDICT r3 item 4): the shipped 2 s human
# recording (_input.wav, the same file the reference's own self-test
# uses, ref: GOOFER.py:1222) extracted by THIS repo and rendered through
# the TRUE upstream chain.  Configs span the families the synthetic
# goldens cover, on real formant structure / breath noise.
VOICE_CONFIGS = [
    ("voice_neutral", "A3", 100, "", 100, 900, 200, 0, 100, 0,
     "!120", "AA"),
    ("voice_shift_loop", "E4", 100, "t20L1", 100, 1200, 200, 0, 100, 0,
     "!120", "AA"),
    ("voice_formants", "A3", 100, "g-12fa6fb-5fw20br25es15", 100, 900,
     200, 0, 100, 0, "!120", "AA"),
    ("voice_texture", "C4", 100, "V70B35sh30sr25sd20su30", 100, 900,
     200, 0, 100, 0, "!120", "AA"),
    ("voice_fry", "G3", 100, "vf30vh50vl25st-20sa20", 100, 900, 200, 0,
     100, 0, "!120", "ABAC#3#AD"),
]


def gen_real_voice(out_dir: Path) -> None:
    """Vendor real-voice goldens: extract the shipped recording with the
    production analysis stack, then render VOICE_CONFIGS through the
    true upstream resampler (pinned seed, f64-phase pulse kernel — same
    substitutions as gen_reference).  Also prints each config's
    upstream seed-0-vs-seed-1 LSD floor, which sets the test budget."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import shutil

    import numpy as np

    from tests import oracles as o
    from tests.ref_harness import load_reference, render_reference
    from goofer_tpu.sampler.resampler import GooferResampler
    from goofer_tpu.utils.audio_io import read_wav
    from goofer_tpu.utils.metrics import lsd_db

    out_dir.mkdir(parents=True, exist_ok=True)
    src = out_dir / "src.wav"
    shutil.copy(REPO / "_input.wav", src)
    scratch = out_dir / "_warm.wav"
    GooferResampler(str(src), str(scratch), *VOICE_CONFIGS[0][1:], seed=0)
    scratch.unlink()
    assert (out_dir / "src_features.goofy").exists()

    gf = load_reference()[0]
    orig_pt = gf.pulse_train_numba
    gf.pulse_train_numba = lambda f0, sr, Ra=0.02, Rg=1.7, Rk=0.8: \
        o.o_pulse_train(f0, sr, Ra, Rg, Rk).astype(np.float32)
    try:
        for name, *args in VOICE_CONFIGS:
            out = out_dir / f"out_{name}.wav"
            render_reference(src, out, *args, seed=0, capture=False)
            alt = out_dir / f"_alt_{name}.wav"
            render_reference(src, alt, *args, seed=1, capture=False)
            y0, sr0 = read_wav(out)
            y1, _ = read_wav(alt)
            alt.unlink()
            floor = lsd_db(np.asarray(y0, np.float32),
                           np.asarray(y1, np.float32), sr0)
            print(f"[golden-voice] {out.name}  seed floor "
                  f"{floor:.2f} dB")
    finally:
        gf.pulse_train_numba = orig_pt


def dump_praat_tracks(out_dir: Path, src: Path) -> None:
    """Vendor Praat ground truth for the analysis trackers (VERDICT r1
    item 5): parselmouth F0 + Burg formant tracks of src.wav, saved as
    tracks_praat.npz.  Requires praat-parselmouth (reference env only);
    tests/test_analysis.py::test_praat_ground_truth activates when the
    file exists under tests/golden/ref/."""
    try:
        import numpy as np
        import parselmouth
    except ImportError as e:
        print(f"[golden-ref] skipping Praat tracks ({e})")
        return
    if not hasattr(parselmouth, "Sound"):
        # the ref_harness placeholder stub, not the real package
        print("[golden-ref] skipping Praat tracks (parselmouth stubbed)")
        return
    import soundfile as sf

    y, sr = sf.read(src)
    if y.ndim > 1:
        y = y.mean(axis=1)
    snd = parselmouth.Sound(y, sr)
    hop = 256
    # same calls the reference makes (ref: GOOFER.py:341-353, 768-792)
    p = snd.to_pitch_ac(time_step=hop / sr, pitch_floor=75.0,
                        voicing_threshold=0.63, silence_threshold=0.01,
                        voiced_unvoiced_cost=0.01, pitch_ceiling=950.0)
    f0 = p.selected_array["frequency"]
    fobj = snd.to_formant_burg(time_step=hop / sr,
                               max_number_of_formants=5)
    nf = fobj.get_number_of_frames()
    forms = np.zeros((5, nf))
    times = np.zeros(nf)
    for i in range(nf):
        t = fobj.get_time_from_frame_number(i + 1)
        times[i] = t
        for k in range(1, 6):
            v = fobj.get_value_at_time(k, t)
            forms[k - 1, i] = 0.0 if v is None or v != v else v
    np.savez(out_dir / "tracks_praat.npz", f0=f0, formants=forms,
             formant_times=times, sr=sr, hop=hop)
    print(f"[golden-ref] tracks_praat.npz (f0 {len(f0)} frames, "
          f"formants {nf} frames)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("repo", "reference", "voice"),
                    default="repo")
    ap.add_argument("--reference", default="/root/reference")
    a = ap.parse_args()
    if a.mode == "repo":
        gen_repo(REPO / "tests" / "golden" / "repo")
    elif a.mode == "voice":
        gen_real_voice(REPO / "tests" / "golden" / "voice")
    else:
        gen_reference(REPO / "tests" / "golden" / "ref",
                      Path(a.reference))
