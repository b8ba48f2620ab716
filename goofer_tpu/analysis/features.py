"""Feature extraction: spectral envelope + F0 + voicing + formants + knots.

Mirrors the reference analysis entry (ref: GOOFER.py:940-969):

* envelope = Gaussian-blurred STFT magnitude (sigma = 2 freq bins) — the
  reference is a blur, not cepstral liftering, and we match the reference;
* F0 = AC pitch track -> nan->0 -> short-gap bridging -> linear per-sample
  interpolation over a shared [0, duration] axis -> clip [1e-5, 2000];
* voicing mask = f0_interp > 75 Hz;
* formants = Burg tracks padded to the envelope frame count;
* mel-knot compression of the envelope for storage.

The entire analysis traces into ONE jitted graph per (length, sr, frame
config) — envelope, pitch, formants, per-sample interpolation and the
knot-error sweep all run in a single device dispatch; the host only picks
the adaptive K (11 scalars) and gathers the chosen knot rows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from goofer_tpu import config
from goofer_tpu.analysis.formants import formant_graph
from goofer_tpu.analysis.pitch import PitchConfig, fix_f0_gaps, pitch_graph
from goofer_tpu.ops.envelope import (
    KNOT_EPS,
    KNOT_K_MAX,
    KNOT_K_START,
    KNOT_K_STEP,
    _knot_bin_idx,
    _decode_matrix,
    mel_knot_freqs,
)
from goofer_tpu.ops.filters import gaussian_blur1d
from goofer_tpu.ops.interp import gather_lerp
from goofer_tpu.ops.stft import stft


@functools.lru_cache(maxsize=32)
def _analysis_graph(n: int, sr: int, n_fft: int, hop: int, f0_min: float,
                    f0_merge_range: int, with_formants: bool):
    """Build + jit the fused analysis for one static configuration."""
    n_bins = n_fft // 2 + 1
    k_values = tuple(range(KNOT_K_START, KNOT_K_MAX + 1, KNOT_K_STEP))

    def graph(y):
        S = stft(y, n_fft, hop)
        mag = jnp.abs(S) + 1e-8
        env_spec = gaussian_blur1d(mag, 2.0, axis=0)
        t_frames = env_spec.shape[1]

        # pitch -> gaps -> per-sample interp -> clip -> mask
        f0_track = pitch_graph(y, sr, hop / sr, PitchConfig(f0_min=f0_min))
        f0_track = jnp.nan_to_num(f0_track)
        f0_track = fix_f0_gaps(f0_track, f0_merge_range)
        if f0_track.shape[0] > 1:
            # shared [0, duration] axis on both grids (ref: GOOFER.py:960-963)
            pos = jnp.linspace(0.0, f0_track.shape[0] - 1.0, n)
            f0_interp = gather_lerp(f0_track, pos, axis=0)
        else:
            f0_interp = jnp.full((n,), f0_track[0])
        f0_interp = jnp.clip(f0_interp, config.F0_CLIP_LO, config.F0_CLIP_HI)
        voicing_mask = (f0_interp > f0_min).astype(jnp.float32)

        if with_formants:
            tracks = formant_graph(y, sr, hop / sr)
        else:
            tracks = jnp.zeros((5, t_frames), dtype=jnp.float32)

        # knot codec error sweep (all candidate K in one dispatch)
        env_s = gaussian_blur1d(env_spec, 0.5, axis=0)
        log_env = jnp.log(jnp.maximum(env_s, 1e-8))
        check_idx = np.linspace(0, t_frames - 1,
                                min(256, t_frames)).astype(np.int64)
        env_check = env_s[:, check_idx]
        log_check = log_env[:, check_idx]
        errs = []
        for k in k_values:
            bin_idx = _knot_bin_idx(sr, n_fft, k, n_bins)
            knots = log_check[bin_idx, :]
            w = jnp.asarray(_decode_matrix(sr, n_fft, k))
            recon = jnp.exp(jnp.dot(w, knots,
                                    preferred_element_type=jnp.float32))
            errs.append(jnp.max(jnp.abs(recon - env_check)
                                / (env_check + 1e-8)))
        return env_spec, f0_interp, voicing_mask, tracks, log_env, \
            jnp.stack(errs)

    return jax.jit(graph), k_values


def extract_features(y, sr: int, n_fft: int = 1024, hop_length: int = 256,
                     f0_min: float = 75.0, f0_merge_range: int = 2,
                     with_formants: bool = True):
    """Returns (env_spec, f0_interp, voicing_mask, formants, env_knots)
    with the reference's shapes and dtypes (NumPy on the way out)."""
    y = np.asarray(y, dtype=np.float32)
    n = len(y)
    graph, k_values = _analysis_graph(n, int(sr), n_fft, hop_length,
                                      float(f0_min), int(f0_merge_range),
                                      bool(with_formants))
    env_spec, f0_interp, voicing_mask, tracks, log_env, errs = graph(
        jnp.asarray(y))

    errs = np.asarray(errs)
    chosen = k_values[-1]
    for k, e in zip(k_values, errs):
        if e < KNOT_EPS:
            chosen = int(k)
            break
    n_bins = n_fft // 2 + 1
    bin_idx = _knot_bin_idx(sr, n_fft, chosen, n_bins)
    knot_rows = np.asarray(log_env[jnp.asarray(bin_idx), :])
    env_knots = {
        "mode": "knots",
        "knot_vals_log": knot_rows.astype(np.float16),
        "hz_knots": mel_knot_freqs(sr, n_fft, chosen),
        "n_bins": int(n_bins),
        "n_fft": int(n_fft),
        "sr": int(sr),
    }

    tracks = np.asarray(tracks)
    t_frames = np.asarray(env_spec).shape[1]
    if tracks.shape[1] < t_frames:
        tracks = np.pad(tracks, ((0, 0), (0, t_frames - tracks.shape[1])))
    else:
        tracks = tracks[:, :t_frames]
    formants = {i + 1: tracks[i] for i in range(tracks.shape[0])}

    return (np.asarray(env_spec), np.asarray(f0_interp, dtype=np.float64),
            np.asarray(voicing_mask, dtype=np.float64), formants, env_knots)
