"""Plain-NumPy oracles restating the reference engine's semantics.

The mounted reference cannot be imported in this image (numba / parselmouth /
soundfile are absent), so these little sequential implementations serve as
the ground truth for the vectorized TPU kernels.  Each function cites the
reference behavior it models (see /root/reference file:line in docstrings);
they are deliberately written loop-style so the equivalence being tested is
between "obvious sequential semantics" and the scan/gather formulations.
"""
from __future__ import annotations

import numpy as np
from scipy.ndimage import gaussian_filter1d as _scipy_g1d


def o_gaussian1d(x, sigma, axis=-1, truncate=4.0):
    """GOOFER.py:241-261 — numpy-'reflect' pad == scipy mode='mirror'."""
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0 or sigma <= 0:
        return x.copy()
    radius = int(truncate * sigma + 0.5)
    if radius <= 0:
        return x.copy()
    return _scipy_g1d(x, sigma, axis=axis, mode="mirror", truncate=truncate)


def o_stft(x, n_fft, hop, window):
    """GOOFER.py:355-370."""
    x = np.asarray(x, dtype=np.float32)
    pad = n_fft // 2
    mode = "reflect" if len(x) >= 2 else "edge"
    xp = np.pad(x, pad, mode=mode)
    if len(xp) < n_fft:
        xp = np.pad(xp, (0, n_fft - len(xp)), mode="edge")
    t = max(1, 1 + (len(xp) - n_fft) // hop)
    frames = np.stack([xp[i * hop: i * hop + n_fft] for i in range(t)], axis=1)
    frames = frames * window[:, None]
    return np.fft.rfft(frames, axis=0)


def o_istft(S, hop, window, length=None):
    """GOOFER.py:372-413."""
    n_fft = (S.shape[0] - 1) * 2
    frames = np.fft.irfft(np.asarray(S, dtype=np.complex64),
                          axis=0, n=n_fft).astype(np.float32)
    t = frames.shape[1]
    pad = n_fft // 2
    expected = n_fft + hop * (t - 1)
    y = np.zeros(expected, dtype=np.float32)
    wsum = np.zeros(expected, dtype=np.float32)
    for i in range(t):
        y[i * hop: i * hop + n_fft] += frames[:, i] * window
        wsum[i * hop: i * hop + n_fft] += window * window
    nz = wsum > 1e-9
    y[nz] /= wsum[nz]
    y = y[pad: expected - pad]
    if length is not None:
        if len(y) < length:
            y = np.pad(y, (0, length - len(y)))
        else:
            y = y[:length]
    return y


def _lf_shape(u, T, Ra, Rg, Rk, guard):
    """LF pulse as a function of normalized position u = t/T."""
    uc = Ra + Rk * (1.0 - Ra)
    if u < 0 or u >= 1.0:
        return 0.0
    if u < Ra:
        if guard:
            return np.sin(np.pi * u * T / (2.0 * Ra * T + 1e-12)) ** 2
        return np.sin(np.pi * u / (2.0 * Ra)) ** 2
    if u < uc:
        if guard:
            tau = (u - Ra) * T / ((uc - Ra) * T + 1e-12)
        else:
            tau = (u - Ra) / (uc - Ra)
        return np.exp(-Rg * tau) * np.cos(np.pi * tau / 2.0)
    return 0.0


def o_pulse_buf(T0, T, Ra, Rg, Rk, guard):
    buf = np.array([_lf_shape(j / T0, T, Ra, Rg, Rk, guard)
                    for j in range(T0)], dtype=np.float64)
    peak = np.max(np.abs(buf))
    if peak > 0:
        buf = buf / peak
    return buf


def o_pulse_train(f0, sr, Ra=0.02, Rg=1.7, Rk=0.8):
    """GOOFER.py:473-554 — sequential phase accumulator + scatter."""
    f0 = np.asarray(f0, dtype=np.float64)
    n = len(f0)
    out = np.zeros(n, dtype=np.float64)
    phase = 0.0
    next_k = 1.0
    last_f0 = 160.0
    for i in range(n):
        if f0[i] > 1e-6:
            last_f0 = f0[i]
        phase += f0[i] / sr
        while phase >= next_k:
            T = 1.0 / max(last_f0, 1e-6)
            T0 = int(round(sr * T))
            T0 = min(max(T0, 3), 8192)
            buf = o_pulse_buf(T0, T, Ra, Rg, Rk, guard=True)
            end = min(n, i + T0)
            out[i:end] += buf[: end - i]
            next_k += 1.0
    return out


def o_subharm_pulses(f0, sr, mask, semitones, weight):
    """GOOFER.py:672-736 — per-ratio event trackers, voiced-gated."""
    f0 = np.asarray(f0, dtype=np.float64)
    mask = np.asarray(mask, dtype=np.float64)
    n = len(f0)
    if not isinstance(semitones, (list, tuple, np.ndarray)):
        semitones = [semitones]
    ratios = [2.0 ** (s / 12.0) for s in semitones]
    trackers = [0.0] * len(ratios)
    last_f0 = 160.0
    out = np.zeros(n, dtype=np.float64)
    for i in range(n):
        if mask[i] <= 0 or f0[i] <= 0:
            continue
        last_f0 = f0[i]
        for j, r in enumerate(ratios):
            sub = last_f0 * r
            if sub < 1e-2:
                continue
            trackers[j] += sub / sr
            if trackers[j] >= 1.0:
                trackers[j] -= 1.0
                T = 1.0 / sub
                T0 = int(round(sr * T))
                if T0 <= 3:
                    T0 = 3
                buf = o_pulse_buf(T0, T, 0.02, 1.7, 1.0, guard=False)
                end = min(n, i + T0)
                out[i:end] += buf[: end - i]
    out = out * mask
    peak = np.max(np.abs(out))
    if peak > 1e-6:
        out = out / peak
    return out * weight


def o_one_pole_hp(x, sr, fc):
    """GOOFER.py:877-892."""
    if fc <= 0:
        return np.zeros_like(x)
    rc = 1.0 / (2.0 * np.pi * fc)
    a = rc / (rc + 1.0 / sr)
    y = np.zeros(len(x))
    px = 0.0
    py = 0.0
    for i in range(len(x)):
        xn = float(x[i])
        yn = a * (py + xn - px)
        y[i] = yn
        px, py = xn, yn
    return y


def o_dynamic_butter(x, f0, sr, factor, order, btype):
    """SillySampler.py:95-174."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    f0 = np.asarray(f0, dtype=np.float64)
    if f0.size != n:
        pos = np.linspace(0, f0.size - 1, n)
        f0 = np.interp(pos, np.arange(f0.size), f0)
    if np.any(f0 > 0):
        pad = 2
        padv = np.pad(f0, (pad, pad), mode="edge")
        f0 = np.convolve(padv, np.ones(5) / 5.0, mode="valid")
    fc = np.where(f0 > 0, f0 * factor, factor)
    floor = 60.0 if btype == "lowpass" else 20.0
    fc = np.clip(fc, floor, 0.45 * sr)
    two_pi = 2 * np.pi
    if btype == "lowpass":
        alpha = two_pi * fc / (two_pi * fc + sr)
    else:
        alpha = sr / (two_pi * fc + sr)
    y = x.copy()
    for _ in range(max(1, int(order))):
        if btype == "lowpass":
            yp = 0.0
            for i in range(n):
                yp = yp + alpha[i] * (y[i] - yp)
                y[i] = yp
        else:
            yp = 0.0
            px = y[0]
            for i in range(n):
                xi = y[i]
                yp = alpha[i] * (yp + xi - px)
                y[i] = yp
                px = xi
    return y


def o_interp_extrap(x, y, x_new):
    """GOOFER.py:204-237."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    out = np.interp(x_new, x, y)
    sl = (y[1] - y[0]) / (x[1] - x[0] + 1e-10)
    sr_ = (y[-1] - y[-2]) / (x[-1] - x[-2] + 1e-10)
    lo = x_new < x[0]
    hi = x_new > x[-1]
    out = np.where(lo, y[0] + sl * (x_new - x[0]), out)
    out = np.where(hi, y[-1] + sr_ * (x_new - x[-1]), out)
    return out


def o_warp_env_by_formants(env, orig_f, shift_f, sr):
    """GOOFER.py:840-875 — per-frame anchor warp."""
    n_bins, t = env.shape
    freqs = np.linspace(0.0, sr / 2.0, n_bins)
    out = np.zeros_like(env)
    for j in range(t):
        src = [0.0]
        dst = [0.0]
        for i in range(4):
            fo, fs = orig_f[i, j], shift_f[i, j]
            if fo > 50.0 and fo < sr / 2.0 and fs > 50.0:
                src.append(fo)
                dst.append(fs)
        src.append(sr / 2.0)
        dst.append(sr / 2.0)
        warped = o_interp_extrap(np.array(dst), np.array(src), freqs)
        out[:, j] = o_interp_extrap(freqs, env[:, j], warped)
    return out


def o_brightness_curve(n_bins, sr, start_hz, end_hz, gain_db):
    """GOOFER.py:585-595."""
    freqs = np.linspace(0, sr / 2, n_bins)
    gain = np.ones_like(freqs)
    i0 = np.searchsorted(freqs, start_hz)
    i1 = np.searchsorted(freqs, end_hz)
    rise = np.linspace(0, 1, i1 - i0)
    g = 10 ** (gain_db / 20.0)
    gain[i0:i1] = 1 + rise * (g - 1)
    gain[i1:] = g
    return gain[:, None]


def o_smooth_mask(mask, sigma=100, ds=4):
    """GOOFER.py:556-569."""
    short = mask[::ds].astype(np.float64)
    short_s = o_gaussian1d(short, max(1.0, sigma / ds))
    return np.interp(np.linspace(0, 1, len(mask)),
                     np.linspace(0, 1, len(short_s)), short_s)


def o_synthesize(env, f0, mask, n, sr, n_fft, hop,
                 uv_strength=0.75, breath_strength=0.1, normalize=1.0,
                 cut_below_f0=True, apply_brightness=True,
                 noise_smoothness=100, rng=None):
    """GOOFER.py:971-1220, neutral path (no jitter/subharm/roughness).

    Returns (mix, harmonic, aper_uv, aper_bre).  Noise phases come from
    ``rng`` (or are zero when rng is None, making the noise branch
    deterministic for testing)."""
    win = np.hanning(n_fft) ** 0.5
    env = np.asarray(env, dtype=np.float64)
    env4b = o_gaussian1d(env, 1.75, axis=0)

    pulse = o_pulse_train(f0, sr)
    S_harm = o_stft(pulse.astype(np.float32), n_fft, hop, win)
    t = S_harm.shape[1]

    freqs = np.fft.rfftfreq(n_fft, 1 / sr)[:, None]
    f0f = f0[::hop]
    if len(f0f) < t:
        f0f = np.pad(f0f, (0, t - len(f0f)), mode="edge")
    f0f = f0f[:t]
    hp = 1.0 / (1.0 + np.exp(-np.clip((freqs - f0f[None, :].reshape(1, -1))
                                      / 5.0, -60, 60)))
    if cut_below_f0:
        S_harm = S_harm * hp
    if env.shape[1] > t:
        env = env[:, :t]
    elif env.shape[1] < t:
        env = np.pad(env, ((0, 0), (0, t - env.shape[1])), mode="edge")
    mag = np.max(np.abs(S_harm) + 1e-8)
    n_bins = S_harm.shape[0]
    boost = np.linspace(1, 100, n_bins)[:, None]
    S_harm = (S_harm / mag) * env * boost

    bh = o_brightness_curve(n_bins, sr, 2000, 3500, 3.0)
    bb = o_brightness_curve(n_bins, sr, 3500, 5000, 20.0)
    vf = mask[::hop]
    if len(vf) < t:
        vf = np.pad(vf, (0, t - len(vf)), mode="edge")
    vf = vf[:t]
    cols = np.nonzero(vf > 0)[0]
    if apply_brightness and len(cols):
        block = S_harm[:, cols] * bh
        S_harm[:, cols] = o_gaussian1d(block.real, 0.5, axis=0) \
            + 1j * o_gaussian1d(block.imag, 0.5, axis=0)
    harmonic = o_istft(S_harm, hop, win, length=n).astype(np.float64)

    envn = env4b
    if envn.shape[1] > t:
        envn = envn[:, :t]
    elif envn.shape[1] < t:
        envn = np.pad(envn, ((0, 0), (0, t - envn.shape[1])), mode="edge")
    if rng is None:
        phi = np.zeros((n_bins, t))
    else:
        phi = rng.uniform(0, 2 * np.pi, size=(n_bins, t))
    U = np.cos(phi) + 1j * np.sin(phi)
    S_uv = U * envn
    S_breath = S_uv * hp
    if apply_brightness and len(cols):
        block = S_breath[:, cols] * bb
        S_breath[:, cols] = o_gaussian1d(block.real, 0.5, axis=0) \
            + 1j * o_gaussian1d(block.imag, 0.5, axis=0)
    aper_breath = o_istft(S_breath, hop, win, length=n).astype(np.float64)
    aper_uv_raw = o_istft(S_uv, hop, win, length=n).astype(np.float64)

    ms = o_smooth_mask(mask, noise_smoothness, 4)
    aper_bre = aper_breath * ms * breath_strength
    aper_uv = aper_uv_raw * (1 - ms) * uv_strength

    combined = harmonic + aper_uv + aper_bre
    peak = float(np.max(np.abs(combined)) + 1e-12)
    gain = (1.0 / peak) ** float(np.clip(normalize, 0, 1))
    return (combined * gain, harmonic * gain, aper_uv * gain,
            aper_bre * gain)


def o_loop_env(env_tail, desired, mode):
    """SillySampler.py:625-696 — sustain looping of the envelope tail,
    including the concat mode's seam-crossfade construction (whose output
    is intentionally longer than `desired`, a reference quirk downstream
    match_env_frames absorbs)."""
    tail = env_tail.shape[1]
    if tail >= desired:
        return env_tail[:, :desired]
    reps = desired // tail
    rem = desired % tail
    if mode == "stretch":
        if tail == 0:
            return np.zeros((env_tail.shape[0], desired), dtype=np.float32)
        factor = desired / tail
        target = int(tail * factor)
        pos = np.linspace(0, tail - 1, target)
        lo = np.clip(np.floor(pos).astype(int), 0, tail - 2 if tail > 1 else 0)
        frac = pos - lo
        return (env_tail[:, lo] * (1 - frac)
                + env_tail[:, np.minimum(lo + 1, tail - 1)] * frac)
    if mode == "avg":
        tile = (env_tail + env_tail[:, ::-1]) / 2.0
        parts = [tile] * reps
        if rem:
            parts.append(tile[:, :rem])
        return np.concatenate(parts, axis=1)
    # concat
    full = [env_tail.copy()]
    for _ in range(reps - 1):
        prev = full[-1]
        f = min(8, tail // 2)
        fi = np.linspace(0, 1, f)[None, :]
        fo = np.linspace(1, 0, f)[None, :]
        cross = prev[:, -f:] * fo + env_tail[:, :f] * fi
        full[-1] = np.concatenate([prev[:, :-f], cross, env_tail[:, f:]],
                                  axis=1)
        full.append(env_tail.copy())
    if rem:
        last = env_tail[:, :rem]
        prev = full[-1]
        f = min(8, rem // 2)
        if f > 0:
            fi = np.linspace(0, 1, f)[None, :]
            fo = np.linspace(1, 0, f)[None, :]
            cross = prev[:, -f:] * fo + last[:, :f] * fi
            chunk = np.concatenate([prev[:, :-f], cross, last[:, f:]], axis=1)
        else:
            chunk = np.concatenate([prev, last], axis=1)
        full[-1] = chunk
    return np.concatenate(full, axis=1)


def o_loop_track(track, desired, mode):
    """SillySampler.py:717-744 — formant-track looping."""
    track = np.asarray(track, dtype=np.float32)
    if mode == "stretch":
        if track.size == 0:
            return np.zeros(desired, dtype=np.float32)
        factor = desired / float(track.size)
        target = int(track.size * factor)
        pos = np.linspace(0, track.size - 1, target)
        return np.interp(pos, np.arange(track.size), track).astype(np.float32)
    if track.size == 0:
        return np.zeros(desired, dtype=np.float32)
    reps = desired // track.size
    rem = desired % track.size
    if mode == "avg":
        tile = (track + track[::-1]) * 0.5
        base = np.tile(tile, reps)
        if rem:
            base = np.concatenate([base, tile[:rem]])
        return base.astype(np.float32)
    base = np.tile(track, reps)
    if rem:
        base = np.concatenate([base, track[:rem]])
    return base.astype(np.float32)


def o_loop_samples(x, desired):
    """SillySampler.py:698-712 — f0/mask always concat-tile."""
    n = len(x)
    if n >= desired:
        return x[:desired]
    reps = desired // n
    rem = desired % n
    parts = [x] * reps
    if rem:
        parts.append(x[:rem])
    return np.concatenate(parts)


def o_stretch_prefix_1d(x, pre_len, factor):
    """SillySampler.py:176-187."""
    n = len(x)
    if pre_len <= 1 or n <= 1 or abs(factor - 1.0) < 1e-6:
        return x
    pre_new = max(1, int(round(pre_len * factor)))
    n_new = pre_new + (n - pre_len)
    idx = np.arange(n_new, dtype=np.float64)
    pos = np.where(idx < pre_new, idx / factor, (idx - pre_new) + pre_len)
    return o_interp_extrap(np.arange(n, dtype=np.float64), x, pos)
