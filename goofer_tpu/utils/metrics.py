"""Parity metrics.

LSD here is computed on smoothed log-magnitude spectrograms.  Calibration
note: the reference synthesizer itself is stochastic (random noise phases,
ref: GOOFER.py:1151-1152), and two reference runs with different seeds
measure ~2.6 dB LSD on raw per-bin spectra.  Smoothing with sigma=2 bins in
frequency and sigma=8 frames in time lowers that realization noise floor to
~0.8 dB, which is what makes the <=1 dB parity budget meaningful.
"""
from __future__ import annotations

import numpy as np


def _smooth_spec(x: np.ndarray, sr: int, n_fft: int, hop: int,
                 freq_sigma: float = 2.0, time_sigma: float = 8.0,
                 eps: float = 1e-6) -> np.ndarray:
    from scipy.ndimage import gaussian_filter1d

    win = (np.hanning(n_fft) ** 0.5).astype(np.float32)
    x = np.asarray(x, dtype=np.float32)
    pad = n_fft // 2
    xp = np.pad(x, pad, mode="reflect" if len(x) >= 2 else "edge")
    t = max(1, 1 + (len(xp) - n_fft) // hop)
    frames = np.stack([xp[i * hop: i * hop + n_fft] for i in range(t)],
                      axis=1) * win[:, None]
    S = np.abs(np.fft.rfft(frames, axis=0)) + eps
    if freq_sigma > 0:
        S = gaussian_filter1d(S, freq_sigma, axis=0, mode="mirror")
    if time_sigma > 0 and S.shape[1] > 1:
        S = gaussian_filter1d(S, time_sigma, axis=1, mode="mirror")
    return S


def lsd_db(a: np.ndarray, b: np.ndarray, sr: int, n_fft: int = 1024,
           hop: int = 256, freq_sigma: float = 2.0,
           time_sigma: float = 8.0) -> float:
    """Log-spectral distance in dB between two waveforms."""
    n = min(len(a), len(b))
    Sa = _smooth_spec(a[:n], sr, n_fft, hop, freq_sigma, time_sigma)
    Sb = _smooth_spec(b[:n], sr, n_fft, hop, freq_sigma, time_sigma)
    d = 20.0 * np.log10(Sa) - 20.0 * np.log10(Sb)
    return float(np.sqrt(np.mean(d ** 2)))


def f0_rmse_cents(f0_a: np.ndarray, f0_b: np.ndarray,
                  voiced_only: bool = True) -> float:
    """RMSE in cents over samples where both tracks are voiced."""
    a = np.asarray(f0_a, dtype=np.float64)
    b = np.asarray(f0_b, dtype=np.float64)
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    if voiced_only:
        sel = (a > 1.0) & (b > 1.0)
        if not np.any(sel):
            return 0.0
        a, b = a[sel], b[sel]
    cents = 1200.0 * np.log2(np.maximum(a, 1e-6) / np.maximum(b, 1e-6))
    return float(np.sqrt(np.mean(cents ** 2)))
