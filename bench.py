"""Headline benchmark: realtime factor rendering a 60 s multi-note phrase
on one TPU chip.

The phrase is 87 notes in three length buckets (0.5 / 0.75 / 1.0 s at
44.1 kHz, totalling 60 s of audio); each bucket renders as ONE vmapped
engine dispatch (the BASELINE.json north star: a whole phrase of notes in
a single jit-traced graph per bucket).  Warmup compiles are excluded; the
steady-state wall clock over the full phrase is timed.

Prints one JSON line: value = rendered-audio-seconds per wall-clock
second; vs_baseline is relative to the 100x-realtime target from
BASELINE.md (the reference publishes no numbers of its own).
"""
from __future__ import annotations

import json
import time

import numpy as np


def _note_features(n, f0_hz, n_fft, hop, n_bins, sr):
    t_frames = 1 + n // hop
    rng = np.random.default_rng(int(f0_hz))
    env = (np.exp(-np.linspace(0, 5.5, n_bins))[:, None]
           * (1.0 + 0.3 * np.sin(np.linspace(0, 11, n_bins)))[:, None]
           * (1.0 + 0.2 * np.sin(np.linspace(0, 6, t_frames)))[None, :]
           + 1e-5).astype(np.float32)
    t = np.arange(n) / sr
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.5 * t)
    f0 = (f0_hz * vib).astype(np.float32)
    head = max(1, n // 12)
    f0[:head] = 0.0
    mask = (f0 > 75).astype(np.float32)
    tracks = np.stack([
        np.full(t_frames, 650.0), np.full(t_frames, 1200.0),
        np.full(t_frames, 2500.0), np.full(t_frames, 3600.0),
    ]).astype(np.float32)
    return env, f0, mask, tracks


def main():
    import jax

    from goofer_tpu.engine.synth import SynthStatic
    from goofer_tpu.parallel.batch import pad_note_batch, render_batch

    sr, n_fft, hop = 44100, 1024, 256

    buckets = [(0.50, 40), (0.75, 27), (1.00, 20)]  # 59.85 s total
    total_audio_sec = sum(d * b for d, b in buckets)

    batches = []
    for dur, count in buckets:
        n = int(dur * sr)
        notes = [
            _note_features(n, 160.0 * 2 ** ((i % 13) / 12.0), n_fft, hop,
                           n_fft // 2 + 1, sr)
            for i in range(count)
        ]
        batch = pad_note_batch([x[0] for x in notes],
                               [x[1] for x in notes],
                               [x[2] for x in notes],
                               [x[3] for x in notes])
        st = SynthStatic(sr=sr, n_fft=n_fft, hop=hop, n=n)
        batches.append((st, batch))

    key = jax.random.PRNGKey(0)

    def render_phrase():
        outs = []
        for st, batch in batches:
            mix, _, _, _ = render_batch(st, batch, key=key)
            outs.append(mix)
        for o in outs:
            jax.block_until_ready(o)
        return outs

    render_phrase()  # warmup/compile

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        render_phrase()
    elapsed = (time.perf_counter() - t0) / reps

    rtf = total_audio_sec / elapsed
    print(json.dumps({
        "metric": "realtime_factor_60s_phrase",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
