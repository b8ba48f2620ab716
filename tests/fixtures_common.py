"""Shared synthetic-feature fixtures for the reference-parity suites.

Both tests/test_resample_oracle.py (production vs restated oracle) and
tests/test_ref_upstream.py (restated oracle vs TRUE upstream code, via
tests/ref_harness.py) must consume byte-identical inputs so the parity
chain production <-> oracle <-> upstream composes.
"""
from __future__ import annotations

import numpy as np

SR = 44100
N_FFT = 1024
HOP = 256

_B64 = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        "0123456789+/")


def encode_pitch_string(cents) -> str:
    """Inverse of the UTAU decode (SillySampler.py:56-70), for building
    test inputs only."""
    out = []
    for v in np.asarray(cents, dtype=np.int64):
        v12 = int(v) & 0xFFF
        out.append(_B64[v12 >> 6] + _B64[v12 & 63])
    return "".join(out)


def make_synth_features():
    """Synthetic source features shaped like a real ~0.75 s sample:
    smooth formant-ish envelope, glide f0 with an unvoiced head, and
    four formant tracks with invalid (zero) frames in the unvoiced
    region — those exercise the raw-vs-sanitized track split (the warp
    must DROP those anchors like the reference, not interpolate).

    Returns (env, f0, mask, forms, SR, ylen)."""
    rng = np.random.default_rng(11)
    ylen = int(0.75 * SR)
    tfr = 1 + ylen // HOP
    n_bins = N_FFT // 2 + 1

    base = np.exp(-np.linspace(0, 5, n_bins))[:, None]
    wob = 1.0 + 0.4 * np.sin(np.linspace(0, 12, n_bins))[:, None]
    drift = 1.0 + 0.25 * np.sin(np.linspace(0, 3, tfr))[None, :]
    env = (base * wob * drift + 1e-5).astype(np.float32)

    t = np.arange(ylen) / SR
    f0 = (205.0 * 2 ** (0.15 * np.sin(2 * np.pi * 1.2 * t))
          ).astype(np.float32)
    head = int(0.08 * SR)
    f0[:head] = 0.0
    mask = (f0 > 75).astype(np.float32)

    def track(center, spread, lo):
        tr = center + spread * np.sin(
            np.linspace(0, 2.5, tfr) + rng.uniform(0, 6))
        tr = tr.astype(np.float32)
        tr[: 1 + head // HOP] = 0.0   # invalid in the unvoiced head
        return np.maximum(tr, 0.0)

    forms = {1: track(700, 60, 120), 2: track(1250, 120, 300),
             3: track(2600, 150, 1500), 4: track(3400, 180, 2000)}
    return env, f0, mask, forms, SR, ylen


NOTE_ARGS = dict(offset=50.0, length=420.0, consonant=140.0, cutoff=80.0,
                 volume=100, modulation=0, tempo="!120")

# ~±70-cent vibrato over 40 ticks: gives pd a real bend curve to chew on
VIB = encode_pitch_string(
    (70 * np.sin(np.linspace(0, 4 * np.pi, 40))).astype(int))

# full-length continuous vibrato (256 ticks ~ 1.33 s): long notes whose
# bend curve would otherwise clamp to a CONSTANT tail pitch park every
# k-th pulse crossing on a near-rational sample grid, where f32-vs-f64
# tie flips band together (PARITY.md pulse-onset ties); keeping the
# pitch moving keeps crossings off the boundary
VIB_LONG = encode_pitch_string(
    (80 * np.sin(np.linspace(0, 7 * np.pi, 256))
     + 15 * np.linspace(0, 1, 256)).astype(int))

DET_CONFIGS = [
    # (id, pitch, velocity, flags, pitch_string, length_ms, min_keep,
    #  outliers).  The source tail is ~480 ms, so length > 480 drives
    # the sustain loop (concat crossfades / mirror-avg / stretch);
    # length 420 keeps the no-loop trim path covered.
    ("env-fx", "C4", 100, "br30es-40fw50g10fa15fb-10P0", VIB, 420,
     0.85, 0.0),
    # the vibrato curve is the realistic input (UTAU always ships a
    # bend) and keeps the phase off exact integer-period ties (A3 =
    # exactly 220 Hz -> 11 periods = exactly 2205 samples, PARITY.md)
    ("loops-vel", "A3", 145, "L2R1P0", VIB_LONG, 1100, 0.85, 0.0),
    ("loops-avg", "C4", 70, "L1P0", VIB_LONG, 1150, 0.85, 0.0),
    ("loops-concat", "D4", 100, "L0P0", VIB_LONG, 1200, 0.85, 0.0),
    ("fry-pd-st", "C4", 100, "vf45vh73vl40pd60st-35t30P0", VIB, 420,
     0.85, 0.0),
    ("layers", "C4", 100, "su50sd35st40fst20fsta-10P0", VIB, 420,
     0.85, 0.0),
    # sg's subharm layer runs at 2x f0 under a depth-3 75 Hz vibrato —
    # hundreds of steep crossings, so a handful flip at f32 scale every
    # note and each excluded window smears +-n_fft through the STFT;
    # coverage is necessarily lower, and XLA fusion rounding makes the
    # fetched-f0 flip prediction itself approximate, so a <=0.1% outlier
    # allowance absorbs onset-grid ambiguities the mask cannot see.  The
    # kept 99.9% still pins the pulse values, envelope path and mix.
    ("subharm", "C4", 100, "sg60P0", VIB, 420, 0.45, 1e-3),
]
