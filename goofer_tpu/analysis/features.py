"""Feature extraction: spectral envelope + F0 + voicing + formants + knots.

Mirrors the reference analysis entry (ref: GOOFER.py:940-969):

* envelope = Gaussian-blurred STFT magnitude (sigma = 2 freq bins) — the
  reference is a blur, not cepstral liftering, and we match the reference;
* F0 = AC pitch track -> nan->0 -> short-gap bridging -> linear per-sample
  interpolation over a shared [0, duration] axis -> clip [1e-5, 2000];
* voicing mask = f0_interp > 75 Hz;
* formants = Burg tracks padded to the envelope frame count;
* mel-knot compression of the envelope for storage.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from goofer_tpu import config
from goofer_tpu.analysis.formants import track_formants
from goofer_tpu.analysis.pitch import PitchConfig, fix_f0_gaps, track_pitch
from goofer_tpu.ops.envelope import compress_env_to_knots
from goofer_tpu.ops.filters import gaussian_blur1d
from goofer_tpu.ops.stft import stft


@functools.partial(jax.jit, static_argnums=(1, 2))
def _envelope(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    S = stft(y, n_fft, hop)
    mag = jnp.abs(S) + 1e-8
    return gaussian_blur1d(mag, 2.0, axis=0)


def extract_features(y, sr: int, n_fft: int = 1024, hop_length: int = 256,
                     f0_min: float = 75.0, f0_merge_range: int = 2,
                     with_formants: bool = True):
    """Returns (env_spec, f0_interp, voicing_mask, formants, env_knots)
    with the reference's shapes and dtypes (NumPy on the way out)."""
    y = np.asarray(y, dtype=np.float32)
    yj = jnp.asarray(y)

    env_spec = _envelope(yj, n_fft, hop_length)
    n_frames = env_spec.shape[1]

    if with_formants:
        tracks = track_formants(yj, sr, hop_length / sr,
                                target_frames=n_frames)
        formants = {i + 1: tracks[i] for i in range(tracks.shape[0])}
    else:
        formants = {i: np.zeros(n_frames) for i in (1, 2, 3, 4, 5)}

    f0_track = track_pitch(yj, sr, hop_length / sr,
                           PitchConfig(f0_min=f0_min))
    f0_track = np.nan_to_num(f0_track)
    f0_track = np.asarray(fix_f0_gaps(jnp.asarray(f0_track), f0_merge_range))

    n = len(y)
    if len(f0_track) > 1:
        times_f0 = np.linspace(0, n / sr, num=len(f0_track))
        times_samples = np.linspace(0, n / sr, num=n)
        f0_interp = np.interp(times_samples, times_f0, f0_track)
    else:
        f0_interp = np.full(n, float(f0_track[0]))
    f0_interp = np.clip(f0_interp, config.F0_CLIP_LO, config.F0_CLIP_HI)

    voicing_mask = (f0_interp > f0_min).astype(np.float64)

    env_np = np.asarray(env_spec)
    env_knots = compress_env_to_knots(env_spec, sr=sr, n_fft=n_fft)
    return env_np, f0_interp, voicing_mask, formants, env_knots
