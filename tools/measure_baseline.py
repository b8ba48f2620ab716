"""Measure the CPU stand-in baseline for the headline bench.

The reference can't run in this image (numba/parselmouth absent), so the
restated NumPy oracle of its synthesis core (tests/oracles.py
o_synthesize — loop-style, file:line-faithful to GOOFER.py:971-1220)
renders the same 97-note bench phrase on the host CPU.  This stands in
for /root/reference/test.py's never-recorded numbers; note the oracle's
pulse loop is pure Python where the reference uses numba, so the
reference itself would land somewhere between this number and a few x
above it.

Prints per-note and phrase totals; paste into BASELINE.md.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

from oracles import o_synthesize  # noqa: E402

SR, NFFT, HOP = 44100, 1024, 256


def note_features(n):
    tf = 1 + n // HOP
    env = (np.exp(-np.linspace(0, 5, NFFT // 2 + 1))[:, None]
           * np.ones((1, tf)) + 1e-5).astype(np.float64)
    f0 = np.full(n, 220.0)
    f0[: n // 10] = 0.0
    mask = (f0 > 75).astype(np.float64)
    return env, f0, mask


def main():
    # the bench phrase: 50 x 0.56 s + 47 x 0.81 s (consonant 60 ms)
    lengths = [int(0.56 * SR)] * 50 + [int(0.81 * SR)] * 47
    total_audio = sum(lengths) / SR

    rng = np.random.default_rng(0)
    # warm numpy/cache effects on one note first
    env, f0, mask = note_features(lengths[0])
    o_synthesize(env, f0, mask, lengths[0], SR, NFFT, HOP, rng=rng)

    t0 = time.perf_counter()
    done_audio = 0.0
    for i, n in enumerate(lengths):
        env, f0, mask = note_features(n)
        o_synthesize(env, f0, mask, n, SR, NFFT, HOP, rng=rng)
        done_audio += n / SR
        if i % 10 == 0:
            el = time.perf_counter() - t0
            print(f"note {i:3d}: {el:6.1f}s elapsed, "
                  f"{done_audio / el:5.2f}x realtime so far", flush=True)
    elapsed = time.perf_counter() - t0
    print(f"\nCPU oracle phrase render: {elapsed:.1f}s for "
          f"{total_audio:.1f}s audio = {total_audio / elapsed:.2f}x realtime")


if __name__ == "__main__":
    main()
