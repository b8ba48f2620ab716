"""Engine self-test / demo harness.

Equivalent of the reference engine's __main__ block (ref:
GOOFER.py:1222-1330) and of its test.py benchmark script: analyse a WAV,
resynthesize it, print wall-clock timings (compile/warmup excluded like
the reference's Numba warmup), and write the four stems next to the input.

Usage:  python examples/engine_selftest.py [input.wav] [--dump-features]
Without an argument a synthetic test tone is generated first.
``--dump-features`` additionally writes the fp16 compressed feature NPZ
with the reference's keys (ref: GOOFER.py:1306-1321, the ``save_feature``
toggle — disabled by default upstream too).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import goofer_tpu.compat as gf  # noqa: E402
from goofer_tpu.utils.audio_io import read_wav_mono, write_wav


def _ensure_input(path: str) -> str:
    if os.path.exists(path):
        return path
    sr = 44100
    n = int(2.0 * sr)
    t = np.arange(n) / sr
    f0 = 200.0 * 2 ** (0.25 * np.sin(2 * np.pi * 0.8 * t))
    phase = np.cumsum(f0 / sr)
    y = 0.4 * (2 * (phase % 1.0) - 1.0)
    y = np.convolve(y, np.ones(6) / 6.0, mode="same")
    write_wav(path, y.astype(np.float32), sr)
    print(f"(generated synthetic input: {path})")
    return path


def main():
    argv = [a for a in sys.argv[1:] if a != "--dump-features"]
    dump_features = "--dump-features" in sys.argv[1:]
    input_file = argv[0] if argv else "_input.wav"
    input_file = _ensure_input(input_file)
    name = os.path.splitext(input_file)[0]

    y, sr = read_wav_mono(input_file)
    n_fft = 2048
    hop = n_fft // 4

    # warmup pass (compile), mirroring the reference's Numba warmup
    env, f0i, vmask, forms, knots = gf.extract_features(
        y, sr, n_fft=n_fft, hop_length=hop)
    gf.synthesize(env, f0i, vmask, y, sr, n_fft=n_fft, hop_length=hop)

    t0 = time.time()
    env, f0i, vmask, forms, knots = gf.extract_features(
        y, sr, n_fft=n_fft, hop_length=hop)
    t1 = time.time()
    print(f"Feature extraction: {t1 - t0:.3f} s")

    reconstruct, harmonic, aper_uv, aper_bre = gf.synthesize(
        env, f0i, vmask, y, sr, n_fft=n_fft, hop_length=hop,
        formants=forms)
    t2 = time.time()
    print(f"Synthesis: {t2 - t1:.3f} s")
    print(f"Time taken: {t2 - t0:.3f} s "
          f"({len(y) / sr / (t2 - t0):.1f}x realtime)")

    for tag, stem in (("reconstruct", reconstruct), ("harmonic", harmonic),
                      ("unvoiced", aper_uv), ("breathiness", aper_bre)):
        out = f"{name}_{tag}.wav"
        write_wav(out, stem, sr)
    print(f"Reconstructed audio saved: {name}_reconstruct.wav")

    if dump_features:
        # fp16 compressed feature dump, key-for-key with the reference's
        # save_feature block (ref: GOOFER.py:1306-1321)
        np.savez_compressed(
            f"{name}_features.npz",
            env_spec=np.asarray(env, dtype=np.float16),
            f0_interp=np.asarray(f0i, dtype=np.float16),
            voicing_mask=np.asarray(vmask, dtype=np.float16),
            formants=forms,
            sr=np.array([sr]),
            y_len=np.array([len(y)]),
        )
        print(f"Saved feature set: {name}_features.npz")


if __name__ == "__main__":
    main()
