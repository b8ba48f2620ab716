"""LF glottal pulse train, TPU-native.

The reference generates pulses with a sequential per-sample phase accumulator
(``pulse_train_numba``, ref: GOOFER.py:473-554) and a per-ratio event tracker
for subharmonics (ref: GOOFER.py:672-746).  Sequential loops are poison on
TPU, so this module reformulates both exactly:

* phase accumulation -> ``cumsum(f0/sr)``; a pulse onset is a sample where
  ``floor(phase)`` increases (the reference fires when the running phase
  crosses the next integer, and f0 < sr guarantees at most one crossing per
  sample);
* the ``last_valid_f0`` carry -> a forward-fill computed with ``cummax`` over
  masked indices;
* the variable-length pulse scatter -> a bounded-overlap gather-sum: the LF
  pulse evaluated on the grid ``t_j = j*T/T0`` is a closed-form function of
  ``u = j/T0`` alone (the open/return phase knees scale with T), so sample n
  receives ``sum_k p((n - onset_k)/T0_k)`` over the last K onsets.  K bounds
  simultaneous pulse overlap; the reference allows unbounded overlap but
  anything beyond K generations back contributes only the low-amplitude tail
  of a pulse (and exactly zero once u > Ra + Rk*(1-Ra)).
* per-pulse peak normalization -> closed form: the LF shape rises
  monotonically for u < Ra and decays monotonically after, so the grid
  maximum is attained at one of the two grid points straddling u = Ra.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from goofer_tpu import config


def _ffill_combine(left, right):
    """last-valid-wins combiner for forward-fill associative scans."""
    lv, lok = left
    rv, rok = right
    return jnp.where(rok, rv, lv), lok | rok


def forward_fill(values: jnp.ndarray, valid: jnp.ndarray,
                 init: float) -> jnp.ndarray:
    """values[i] from the most recent valid index <= i, else ``init``.

    Implemented as an associative scan over (value, valid) pairs — TPU
    gathers are slow, log-depth scans run at memory bandwidth."""
    vals = values.astype(jnp.float32)
    filled, ok = jax.lax.associative_scan(_ffill_combine, (vals, valid))
    return jnp.where(ok, filled, jnp.asarray(init, vals.dtype))


def _ffill_rows(vals: jnp.ndarray, valid: jnp.ndarray):
    """Row-wise forward fill: vals (N, C), valid (N,).  Returns filled rows
    and per-row validity (whether any valid row <= n exists)."""
    ok = valid[:, None]
    filled, ok_out = jax.lax.associative_scan(
        _ffill_combine, (vals, jnp.broadcast_to(ok, vals.shape)))
    return filled, ok_out[:, 0]


def lf_pulse_value(u: jnp.ndarray, T: jnp.ndarray, Ra: float, Rg: float,
                   Rk: float, guard: bool) -> jnp.ndarray:
    """LF pulse evaluated at normalized position u = t/T in [0, 1).

    ``guard=True`` reproduces the tiny epsilon guards of the Numba kernel
    (ref: GOOFER.py:514-517) which are scaled by the period T;
    ``guard=False`` matches ``lf_model_pulse`` (ref: GOOFER.py:437-462).
    """
    uc = Ra + Rk * (1.0 - Ra)
    if guard:
        rise = jnp.sin(jnp.pi * u * T / (2.0 * Ra * T + 1e-12)) ** 2
        tau = (u - Ra) * T / ((uc - Ra) * T + 1e-12)
    else:
        rise = jnp.sin(jnp.pi * u / (2.0 * Ra)) ** 2
        tau = (u - Ra) / (uc - Ra)
    decay = jnp.exp(-Rg * tau) * jnp.cos(jnp.pi * tau / 2.0)
    out = jnp.where(u < Ra, rise, jnp.where(u < uc, decay, 0.0))
    return jnp.where((u >= 0.0) & (u < 1.0), out, 0.0)


def _grid_peak(T0: jnp.ndarray, T: jnp.ndarray, Ra: float, Rg: float,
               Rk: float, guard: bool) -> jnp.ndarray:
    """max_j |p(j/T0)| in closed form (monotone rise then monotone decay)."""
    j_lo = jnp.floor(Ra * T0)
    j_hi = jnp.minimum(j_lo + 1.0, T0 - 1.0)
    p_lo = lf_pulse_value(j_lo / T0, T, Ra, Rg, Rk, guard)
    p_hi = lf_pulse_value(j_hi / T0, T, Ra, Rg, Rk, guard)
    peak = jnp.maximum(p_lo, p_hi)
    return jnp.maximum(peak, 1e-12)


def _onsets_from_phase(phase: jnp.ndarray) -> jnp.ndarray:
    """True at samples where floor(phase) increased (integer crossing)."""
    k = jnp.floor(phase)
    k_prev = jnp.concatenate([jnp.zeros((1,), k.dtype), k[:-1]])
    return k > k_prev


def _accumulate_pulses(n_samples: int, onset: jnp.ndarray,
                       T0_track: jnp.ndarray, T_track: jnp.ndarray,
                       Ra: float, Rg: float, Rk: float, guard: bool,
                       max_overlap: int) -> jnp.ndarray:
    """Sum LF pulses started at onset samples, K-bounded overlap.

    ``T0_track``/``T_track`` give, per sample, the period (samples /
    seconds) a pulse would use if it started there; they are only read at
    onsets.

    Gather-free formulation: let A_0[n] be the (position, period, norm)
    row of the most recent onset <= n (a forward-fill scan), and A_k the
    row of the onset k generations back — obtained by, at each onset,
    picking up A_{k-1} from the previous sample and forward-filling again.
    Each level is one shift + one associative scan over (N, 4) rows, which
    runs at memory bandwidth; per-sample table gathers (the naive lowering
    of "look up generation g-k") are ~100x slower on TPU.
    """
    n = n_samples
    pos_track = jnp.arange(n, dtype=jnp.float32)
    T0f = T0_track.astype(jnp.float32)
    Tf = T_track.astype(jnp.float32)
    norm_track = _grid_peak(T0f, Tf, Ra, Rg, Rk, guard)
    rows = jnp.stack([pos_track, T0f, Tf, norm_track], axis=1)  # (N, 4)

    sample_idx = pos_track
    out = jnp.zeros((n,), dtype=jnp.float32)

    filled, ok = _ffill_rows(rows, onset)
    for k in range(max_overlap):
        i_on = filled[:, 0]
        T0_g = filled[:, 1]
        T_g = filled[:, 2]
        nrm = filled[:, 3]
        offs = sample_idx - i_on
        u = offs / T0_g
        val = lf_pulse_value(u, T_g, Ra, Rg, Rk, guard) / nrm
        out = out + jnp.where(ok & (offs >= 0) & (offs < T0_g), val, 0.0)
        if k + 1 < max_overlap:
            # rows of the onset one generation further back: at each onset
            # sample, adopt the previous sample's current-level row
            prev = jnp.concatenate([filled[:1], filled[:-1]], axis=0)
            prev_ok = jnp.concatenate([jnp.zeros((1,), bool), ok[:-1]])
            filled, ok = _ffill_rows(prev, onset & prev_ok)
    return out


def pulse_train(f0: jnp.ndarray, sr: float,
                Ra: float = config.PULSE_RA,
                Rg: float = config.PULSE_RG,
                Rk: float = config.PULSE_RK,
                fallback_f0: float = config.PULSE_FALLBACK_F0,
                max_overlap: int = config.PULSE_MAX_OVERLAP) -> jnp.ndarray:
    """ARX-LF pulse train from a per-sample f0 track.

    Vectorized equivalent of ``pulse_train_numba`` (ref: GOOFER.py:473-554):
    phase accumulates f0/sr every sample (voiced or not); each integer
    crossing starts one peak-normalized LF pulse whose period comes from the
    most recent f0 > 1e-6 (initially ``fallback_f0``), clamped to
    [3, 8192] samples.
    """
    f0 = jnp.asarray(f0, dtype=jnp.float32)
    n = f0.shape[0]
    f0v = forward_fill(f0, f0 > 1e-6, fallback_f0)
    phase = jnp.cumsum(f0 / sr)
    onset = _onsets_from_phase(phase)
    T = 1.0 / jnp.maximum(f0v, 1e-6)
    T0 = jnp.clip(jnp.round(sr * T), config.PULSE_T0_MIN, config.PULSE_T0_MAX)
    return _accumulate_pulses(n, onset, T0, T, Ra, Rg, Rk, guard=True,
                              max_overlap=max_overlap)


def subharm_pulse_train(f0: jnp.ndarray, sr: float, mask: jnp.ndarray,
                        semitones, weight: float,
                        fallback_f0: float = config.PULSE_FALLBACK_F0,
                        max_overlap: int = 8) -> jnp.ndarray:
    """Subharmonic pulse layer (ref: GOOFER.py:672-746).

    Per semitone ratio, a phase tracker accumulates ``sub_f0/sr`` on voiced
    samples only (sub_f0 = ratio * forward-filled f0) and fires an LF pulse
    (Ra=0.02, Rg=1.7, Rk=1) at each integer crossing.  The summed pulse is
    gated by the voicing mask, peak-normalized globally, then scaled by
    ``weight``.
    """
    f0 = jnp.asarray(f0, dtype=jnp.float32)
    mask = jnp.asarray(mask, dtype=jnp.float32)
    n = f0.shape[0]
    if not isinstance(semitones, (list, tuple, np.ndarray)):
        semitones = [semitones]

    active = (mask > 0) & (f0 > 0)
    last_f0 = forward_fill(f0, active, fallback_f0)

    total = jnp.zeros((n,), dtype=jnp.float32)
    for semi in semitones:
        ratio = 2.0 ** (float(semi) / 12.0)
        sub_f0 = last_f0 * ratio
        accumulating = active & (sub_f0 >= 1e-2)
        phase = jnp.cumsum(jnp.where(accumulating, sub_f0 / sr, 0.0))
        onset = _onsets_from_phase(phase) & accumulating
        T = 1.0 / jnp.maximum(sub_f0, 1e-6)
        T0 = jnp.clip(jnp.round(sr * T), config.PULSE_T0_MIN,
                      config.PULSE_T0_MAX)
        total = total + _accumulate_pulses(
            n, onset, T0, T, Ra=0.02, Rg=1.7, Rk=1.0, guard=False,
            max_overlap=max_overlap)

    total = total * mask
    peak = jnp.max(jnp.abs(total))
    total = jnp.where(peak > 1e-6, total / peak, total)
    return total * weight
