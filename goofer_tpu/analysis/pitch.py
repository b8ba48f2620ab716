"""Autocorrelation pitch tracker (Boersma-style), replacing Praat's C++
``to_pitch`` AC method (ref: GOOFER.py:341-353, called with floor 75 Hz /
ceiling 950 Hz / time_step = hop/sr).

Algorithm: Hann-windowed frames of 3/f0_min seconds, autocorrelation via
rfft normalized by the window's own autocorrelation, parabolic peak
refinement, top-K voiced candidates with Boersma's octave-cost corrected
strengths plus an unvoiced candidate, then a Viterbi path over frames with
octave-jump and voiced/unvoiced transition costs.  Praat internals are not
bit-reproducible; the parity budget is F0 RMSE on the driver configs, and
frame counts may differ — downstream interpolates tracks over a shared
[0, duration] axis exactly like the reference does (ref: GOOFER.py:960-963).

Everything is fixed-shape and jit-compatible; the Viterbi is a lax.scan over
frames with K+1 states.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PitchConfig:
    f0_min: float = 75.0
    f0_max: float = 950.0
    periods_per_window: float = 3.0
    max_candidates: int = 6           # voiced candidates kept per frame
    silence_threshold: float = 0.03   # Praat defaults
    voicing_threshold: float = 0.45
    octave_cost: float = 0.01
    octave_jump_cost: float = 0.35
    voiced_unvoiced_cost: float = 0.14


def _frame_grid(n_samples: int, sr: float, dt: float, wlen: int):
    """Praat-style centered frame grid: as many frames of length wlen as fit,
    centered in the signal."""
    duration = n_samples / sr
    wdur = wlen / sr
    n_frames = max(1, int(np.floor((duration - wdur) / dt)) + 1)
    t1 = (duration - (n_frames - 1) * dt) / 2.0
    centers = t1 + dt * np.arange(n_frames)
    starts = np.round(centers * sr - wlen / 2.0).astype(np.int64)
    starts = np.clip(starts, 0, max(0, n_samples - wlen))
    return n_frames, starts, centers


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _candidates(y, sr: float, wlen: int, nfft: int, cfg: PitchConfig,
                starts):
    """Per-frame voiced candidates (freq, strength) + local intensity."""
    lag_min = max(2, int(np.floor(sr / cfg.f0_max)))
    lag_max = int(np.ceil(sr / cfg.f0_min))
    lag_max = min(lag_max, wlen - 2)

    idx = starts[:, None] + jnp.arange(wlen)[None, :]
    frames = y[idx]                                     # (F, wlen)
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    local_peak = jnp.max(jnp.abs(frames), axis=1)

    window = jnp.asarray(np.hanning(wlen).astype(np.float32))
    xw = frames * window[None, :]

    spec = jnp.fft.rfft(xw, n=nfft, axis=1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=1)
    r0 = jnp.maximum(ac[:, 0:1], 1e-12)
    r = ac / r0                                          # (F, nfft)

    # window autocorrelation (static)
    w = np.hanning(wlen).astype(np.float64)
    wac = np.fft.irfft(np.abs(np.fft.rfft(w, n=nfft)) ** 2, n=nfft)
    wac = (wac / wac[0]).astype(np.float32)
    wac = np.where(np.abs(wac) > 1e-6, wac, 1e-6)
    r = r / jnp.asarray(wac)[None, :]

    lags = jnp.arange(nfft)
    in_range = (lags >= lag_min) & (lags <= lag_max)

    rm1 = jnp.roll(r, 1, axis=1)
    rp1 = jnp.roll(r, -1, axis=1)
    is_peak = (r > rm1) & (r >= rp1) & in_range[None, :]

    # parabolic refinement around each lag
    denom = rm1 - 2.0 * r + rp1
    dlag = jnp.where(jnp.abs(denom) > 1e-12,
                     0.5 * (rm1 - rp1) / denom, 0.0)
    dlag = jnp.clip(dlag, -0.5, 0.5)
    r_ref = r - 0.25 * (rm1 - rp1) * dlag
    lag_ref = lags[None, :] + dlag

    freq = sr / jnp.maximum(lag_ref, 1e-6)
    # Boersma's octave-cost corrected local strength
    strength = r_ref - cfg.octave_cost * jnp.log2(
        jnp.maximum(cfg.f0_min * lag_ref / sr, 1e-12))
    strength = jnp.where(is_peak, strength, -1e9)

    top_s, top_i = jax.lax.top_k(strength, cfg.max_candidates)
    top_f = jnp.take_along_axis(freq, top_i, axis=1)
    top_f = jnp.clip(top_f, cfg.f0_min * 0.5, cfg.f0_max)
    return top_f, top_s, local_peak


@functools.partial(jax.jit, static_argnums=(3,))
def _viterbi(freqs, strengths, unvoiced_strength, cfg: PitchConfig,
             dt_ratio, valid=None):
    """Max-sum path over (K voiced + 1 unvoiced) states per frame.

    ``valid`` (F,) bool marks true frames when the arrays carry trailing
    bucket padding: invalid steps pass delta/state through untouched, so
    the path over the true frames equals the unpadded solve exactly."""
    k = freqs.shape[1]
    # state arrays: index 0..k-1 voiced, k = unvoiced
    s_all = jnp.concatenate([strengths, unvoiced_strength[:, None]], axis=1)
    f_all = jnp.concatenate([freqs, jnp.zeros_like(freqs[:, :1])], axis=1)
    if valid is None:
        valid = jnp.ones((freqs.shape[0],), dtype=bool)

    vu_cost = cfg.voiced_unvoiced_cost * dt_ratio
    oj_cost = cfg.octave_jump_cost * dt_ratio

    def trans_cost(f_prev, f_next):
        pv = f_prev > 0
        nv = f_next > 0
        both = pv & nv
        jump = oj_cost * jnp.abs(
            jnp.log2(jnp.maximum(f_prev, 1e-6) / jnp.maximum(f_next, 1e-6)))
        return jnp.where(both, jump, jnp.where(pv ^ nv, vu_cost, 0.0))

    ident = jnp.arange(k + 1)

    def step(delta_prev, inputs):
        s_t, f_t, f_prev, v_t = inputs
        cost = trans_cost(f_prev[:, None], f_t[None, :])   # (K+1, K+1)
        scores = delta_prev[:, None] - cost
        best_prev = jnp.where(v_t, jnp.argmax(scores, axis=0), ident)
        delta = jnp.where(v_t, s_t + jnp.max(scores, axis=0), delta_prev)
        return delta, best_prev

    delta0 = s_all[0]
    deltaT, back = jax.lax.scan(step, delta0,
                                (s_all[1:], f_all[1:], f_all[:-1],
                                 valid[1:]))

    last = jnp.argmax(deltaT)

    def backstep(state, bp):
        return bp[state], state

    first, rest = jax.lax.scan(backstep, last, back, reverse=True)
    path = jnp.concatenate([jnp.asarray([first]), rest])
    f0 = jnp.take_along_axis(f_all, path[:, None], axis=1)[:, 0]
    return jnp.where(valid, f0, 0.0)


def pitch_graph(y: jnp.ndarray, sr: float, dt: float,
                cfg: PitchConfig = PitchConfig()) -> jnp.ndarray:
    """Pure-JAX frame-rate F0 track (traceable into a larger graph)."""
    y = jnp.asarray(y, dtype=jnp.float32)
    n = y.shape[0]
    wlen = int(round(cfg.periods_per_window / cfg.f0_min * sr))
    wlen = min(wlen, max(16, n))
    nfft = 1
    while nfft < 2 * wlen:
        nfft *= 2
    n_frames, starts, _ = _frame_grid(n, sr, dt, wlen)

    freqs, strengths, local_peak = _candidates(
        y, float(sr), wlen, nfft, cfg, jnp.asarray(starts))

    global_peak = jnp.maximum(jnp.max(jnp.abs(y)), 1e-12)
    intensity = local_peak / global_peak
    unvoiced_strength = cfg.voicing_threshold + jnp.maximum(
        0.0, 2.0 - (intensity * (1.0 + cfg.voicing_threshold)
                    / cfg.silence_threshold))

    if n_frames == 1:
        best = jnp.argmax(jnp.concatenate(
            [strengths[0], unvoiced_strength[:1]]))
        f_all = jnp.concatenate([freqs[0], jnp.zeros((1,))])
        return f_all[best].reshape(1)

    dt_ratio = dt / 0.01
    return _viterbi(freqs, strengths, unvoiced_strength, cfg,
                    jnp.float32(dt_ratio))


def pitch_window_len(sr: float, cfg: PitchConfig = PitchConfig()) -> int:
    """Static analysis window length for this sr/config."""
    return int(round(cfg.periods_per_window / cfg.f0_min * sr))


def pitch_graph_bucketed(y_pad: jnp.ndarray, sr: float, dt: float,
                         starts, nf_true, cfg: PitchConfig = PitchConfig()
                         ) -> jnp.ndarray:
    """Bucket-padded pitch track: ``y_pad`` is a zero-padded waveform,
    ``starts`` the host-computed frame grid of the TRUE signal padded (by
    repeating its last entry) to a static frame bucket, ``nf_true`` the
    traced true frame count.  Returns (F_pad,) f0 with zeros past
    nf_true; values on the true frames equal the unpadded pitch_graph
    (the host grid clamps windows inside the true signal, and the Viterbi
    passes through padded steps untouched)."""
    y = jnp.asarray(y_pad, dtype=jnp.float32)
    n = y.shape[0]
    wlen = min(pitch_window_len(sr, cfg), max(16, n))
    nfft = 1
    while nfft < 2 * wlen:
        nfft *= 2
    starts = jnp.asarray(starts)
    f_pad = starts.shape[0]

    freqs, strengths, local_peak = _candidates(
        y, float(sr), wlen, nfft, cfg, starts)

    global_peak = jnp.maximum(jnp.max(jnp.abs(y)), 1e-12)
    intensity = local_peak / global_peak
    unvoiced_strength = cfg.voicing_threshold + jnp.maximum(
        0.0, 2.0 - (intensity * (1.0 + cfg.voicing_threshold)
                    / cfg.silence_threshold))

    valid = jnp.arange(f_pad) < nf_true
    dt_ratio = dt / 0.01
    return _viterbi(freqs, strengths, unvoiced_strength, cfg,
                    jnp.float32(dt_ratio), valid)


def track_pitch(y, sr: float, dt: float,
                cfg: PitchConfig = PitchConfig()) -> np.ndarray:
    """Frame-rate F0 track in Hz, 0 where unvoiced."""
    return np.asarray(pitch_graph(jnp.asarray(y, dtype=jnp.float32),
                                  sr, dt, cfg))


def fix_f0_gaps(f0: jnp.ndarray, max_gap: int = 4) -> jnp.ndarray:
    """Bridge interior zero-runs of length <= max_gap by linear interpolation
    (ref: GOOFER.py:415-435), vectorized via two-sided nearest-valid scans."""
    from goofer_tpu.ops.pulse import forward_fill

    f0 = jnp.asarray(f0, dtype=jnp.float32)
    n = f0.shape[0]
    valid = f0 != 0.0
    i = jnp.arange(n, dtype=jnp.float32)

    left_idx = jax.lax.cummax(jnp.where(valid, i, -1.0), axis=0)
    right_idx = -jax.lax.cummax(
        jnp.where(valid, -i, -(2.0 * n)), axis=0, reverse=True)

    left_ok = left_idx >= 0
    right_ok = right_idx < n
    gap_len = right_idx - left_idx - 1.0
    fillable = (~valid) & left_ok & right_ok & (gap_len <= max_gap)

    left_val = forward_fill(f0, valid, 0.0)
    right_val = forward_fill(f0[::-1], valid[::-1], 0.0)[::-1]
    ratio = (i - left_idx) / jnp.maximum(right_idx - left_idx, 1.0)
    bridged = left_val * (1.0 - ratio) + right_val * ratio
    return jnp.where(fillable, bridged, f0)
