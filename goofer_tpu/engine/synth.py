"""Harmonic-plus-noise resynthesis as a single jit-traced graph.

Mirrors the reference resynthesis entry (ref: GOOFER.py:971-1220):
LF pulse train -> STFT -> f0-tracking sigmoid highpass -> envelope
imposition with the 1..100 boost tilt -> brightness shelf + freq blur on
voiced frames -> iSTFT, plus a random-phase noise branch split into
breath (highpassed, voiced-gated) and unvoiced (inverse-gated) stems,
optional jitter/subharmonic/roughness texture, and peak normalization
``gain = (1/peak) ** normalize``.

Split of parameters:

* ``SynthStatic`` — hashable compile-time config: shapes, frame params and
  branch toggles.  Changing any of these retraces (a handful of variants
  per session).
* ``knobs`` — a dict of traced f32 scalars (shift ratios, mix strengths,
  normalize amount...).  Changing these does NOT retrace, so successive
  notes with different flag values reuse the compiled graph.

The ``y`` audio argument of the reference is only ever used for its length
(the resampler passes an empty bool buffer, ref: SillySampler.py:1001), so
the graph takes no waveform input at all.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from goofer_tpu import config
from goofer_tpu.ops.envelope import (
    match_env_frames,
    shift_formants_global,
    warp_env_by_formants,
)
from goofer_tpu.ops.filters import (
    gaussian_blur1d,
    gaussian_blur_complex_freq,
    smooth_mask_downsampled,
)
from goofer_tpu.ops.jitter import (
    f0_jitter as make_f0_jitter,
    subharm_vibrato as apply_subharm_vibrato,
    vocal_roughness,
    volume_jitter as make_volume_jitter,
)
from goofer_tpu.ops.pulse import pulse_train, subharm_pulse_train
from goofer_tpu.ops.stft import frame_count, istft, stft
from goofer_tpu.ops.windows import boost_curve, brightness_curves, rfft_freqs


@dataclass(frozen=True)
class SynthStatic:
    """Compile-time synthesis configuration (hashable)."""
    sr: int
    n_fft: int = 1024
    hop: int = 256
    n: int = 0                       # output length in samples
    f0_jitter: bool = False
    f0_jitter_speed: float = 100.0
    volume_jitter: bool = False
    volume_vibrato: bool = False
    volume_jitter_speed: float = 150.0
    add_subharm: bool = False
    subharm_semitones: tuple = (-12.0,)
    subharm_vibrato: bool = False
    subharm_vibrato_delay: float = 0.1
    subharm_f0_jitter_on: bool = False
    cut_subharm_below_f0: bool = True
    warp_formants: bool = False
    # host-derived bound on the warp's bin offset (0 = unbounded gather);
    # see ops/envelope.banded_gather_lerp_columns
    warp_band: int = 0
    formant_shift_on: bool = False
    apply_brightness: bool = True
    noise_transition_smoothness: float = 100.0
    # False skips the whole aperiodic branch (breath-env blur, phase
    # draws, S_uv/S_breath, two iSTFTs, mask smoothing) and returns zero
    # noise stems.  For harmonic-only layer passes (su/sj,
    # SillySampler.py:1037-1081) whose callers discard the stems.  The
    # peak-normalize gain then divides by peak(harmonic) instead of
    # upstream's peak(harmonic + discarded noise stems) — a bias bounded
    # by noise_rms/harmonic_peak (~0.3 dB on the layer stem, inside the
    # seed-to-seed realization floor measured in tests/test_golden.py),
    # and exactly zero under P0 (normalize=0, gain=1).
    need_noise: bool = True
    # False skips the unvoiced stem's iSTFT and gating while keeping the
    # breath stem.  For the sa aperiodic layer (SillySampler.py:1153-1172):
    # it synthesizes with an all-ones mask, and upstream gates uv by
    # (1 - smooth(mask)) (GOOFER.py:1179-1183) — smoothing all-ones is
    # exactly ones (reflect padding), so the uv stem is structurally ZERO
    # there.  Unlike need_noise=False this is exact: the skipped stem
    # contributes 0 to the normalization peak too.
    need_uv: bool = True
    roughness_on: bool = False
    rough_k_list: tuple = (2, 3, 4)
    rough_h_list: tuple | None = None
    rough_alpha: float = 0.6
    rough_hp_fc: float = 320.0
    rough_noise_amp: float = 0.6
    rough_noise_smooth_ms: float = 120.0
    rough_alpha_slew_ms: float = 120.0
    max_overlap: int = config.PULSE_MAX_OVERLAP
    # assumed minimum pulse-onset spacing (samples), host-derived from the
    # note's f0 ceiling; sizes the compact onset tables and slab gathers.
    # The subharmonic layer runs up to ratio x (1 + vibrato depth) x
    # (1 + jitter strength) denser, so callers that know those host-side
    # values derive ``subharm_min_spacing`` too; its default 8 is the
    # pre-adaptive worst case.
    pulse_min_spacing: int = config.PULSE_MIN_SPACING
    subharm_min_spacing: int = 8
    # bucketed rendering: ``n`` is a padded length bucket and the true
    # note length rides in as the traced knob ``n_true``; stems are
    # zeroed past it BEFORE peak normalization, so notes of different
    # true lengths share one compiled graph with exact normalization
    masked: bool = False


def default_knobs() -> dict:
    """Traced scalar parameters with the reference's defaults
    (ref: GOOFER.py:971-983)."""
    return {
        "pitch_shift": 1.0,
        "formant_shift": 1.0,
        "formant_band_shifts": np.ones(4, dtype=np.float32),  # F1..F4
        "uv_strength": 0.75,
        "breath_strength": 0.1,
        "normalize": 1.0,
        "f0_jitter_strength": 1.5,
        "volume_jitter_strength_harm": 50.0,
        "volume_jitter_strength_breath": 100.0,
        "subharm_weight": 0.5,
        "subharm_vibrato_rate": 6.0,
        "subharm_vibrato_depth": 0.1,
        "subharm_f0_jitter_strength": 0.0,
    }


def synth_core_impl(st: SynthStatic, env_spec, f0_interp, voicing_mask,
                    formants_array, knobs, key):
    """Unjitted single-note synthesis graph; vmap/pjit-able.  Prefer
    ``synthesize`` (host entry) or ``_synth_core`` (jitted) for direct
    use."""
    return _synth_body(st, env_spec, f0_interp, voicing_mask,
                       formants_array, knobs, key)


def _frame_phases(key, n_bins: int, t_frames: int) -> jnp.ndarray:
    """(n_bins, T) uniform [0, 2pi) phases, each frame drawn from
    fold_in(key, frame) so draws are invariant to the frame count."""

    def one(f):
        return jax.random.uniform(
            jax.random.fold_in(key, f), (n_bins,), dtype=jnp.float32,
            minval=0.0, maxval=2.0 * np.pi)

    return jax.vmap(one, out_axes=1)(jnp.arange(t_frames))


def _synth_body(st: SynthStatic, env_spec, f0_interp, voicing_mask,
                formants_array, knobs, key):
    sr, n_fft, hop, n = st.sr, st.n_fft, st.hop, st.n
    k_phase, k_f0j, k_vjh, k_vjb, k_subj, k_rough = jax.random.split(key, 6)

    env_spec = env_spec.astype(jnp.float32)
    f0 = f0_interp.astype(jnp.float32)
    mask = voicing_mask.astype(jnp.float32)

    # Bucketed rendering (st.masked): the graph runs on the padded length
    # bucket ``n`` while the true note length rides in as the traced knob
    # ``n_true``.  Reproducing the unpadded graph requires three cuts:
    #   * excitation is zeroed past n_true, and the stft's right reflect
    #     pad at the TRUE end is written in explicitly (the reference's
    #     mag normalization sees mirrored pulses in its last frames —
    #     dropping them shifts the whole harmonic gain by ~10%);
    #   * spectral frames past the true frame count are zeroed BEFORE the
    #     mag reduction and the iSTFTs;
    #   * stems are zeroed past hop*floor(n_true/hop) — the unpadded
    #     iSTFT's OLA coverage end, whose remainder it zero-pads.
    valid_in = valid_out = None
    n_true_i = None
    if st.masked:
        n_true_i = jnp.round(knobs["n_true"]).astype(jnp.int32)
        idx = jnp.arange(n, dtype=jnp.int32)
        valid_in = (idx < n_true_i).astype(jnp.float32)
        valid_out = (idx < hop * (n_true_i // hop)).astype(jnp.float32)

    env4breath = (gaussian_blur1d(env_spec, 1.75, axis=0)
                  if st.need_noise else None)
    f0 = f0 * knobs["pitch_shift"]

    if st.warp_formants:
        shifted = formants_array * knobs["formant_band_shifts"][:, None]
        env_spec = warp_env_by_formants(env_spec, formants_array, shifted,
                                        sr, band=st.warp_band)
    if st.formant_shift_on:
        env_spec = shift_formants_global(env_spec, knobs["formant_shift"], sr)

    if st.f0_jitter:
        jit_track = make_f0_jitter(k_f0j, n, sr, st.f0_jitter_speed,
                                   knobs["f0_jitter_strength"])
        f0 = f0 * (1.0 + (jit_track - 1.0) * mask)

    pulse = pulse_train(f0, sr, max_overlap=st.max_overlap,
                        min_spacing=st.pulse_min_spacing)

    if st.add_subharm:
        f0_sub = f0
        if st.subharm_f0_jitter_on:
            sj = make_f0_jitter(k_subj, n, sr, st.f0_jitter_speed,
                                knobs["subharm_f0_jitter_strength"])
            f0_sub = f0_sub * (1.0 + (sj - 1.0) * mask)
        if st.subharm_vibrato:
            f0_sub = apply_subharm_vibrato(
                f0_sub, sr, knobs["subharm_vibrato_rate"],
                knobs["subharm_vibrato_depth"], st.subharm_vibrato_delay)
        sub_mask = mask * valid_in if st.masked else mask
        pulse = pulse + subharm_pulse_train(
            f0_sub, sr, sub_mask, list(st.subharm_semitones),
            knobs["subharm_weight"], min_spacing=st.subharm_min_spacing)

    if st.masked:
        # cut the excitation at the true end and write the reflect pad
        # the unpadded stft would see there: padded[n_true+k] =
        # pulse[n_true-2-k].  _bucketize guarantees n >= n_true+n_fft//2.
        pulse = pulse * valid_in
        m = n_fft // 2
        src = jnp.clip(n_true_i - 2 - jnp.arange(m, dtype=jnp.int32),
                       0, n - 1)
        pulse = jax.lax.dynamic_update_slice(
            pulse, jnp.take(pulse, src), (n_true_i,))

    S_harm = stft(pulse, n_fft, hop)
    t_frames = S_harm.shape[1]

    frame_valid = None
    if st.masked:
        # true frame count of the unpadded stft: 1 + n_true // hop
        tf_true = 1 + n_true_i // hop
        frame_valid = (jnp.arange(t_frames, dtype=jnp.int32)
                       < tf_true).astype(jnp.float32)[None, :]
        S_harm = S_harm * frame_valid

    freqs = jnp.asarray(rfft_freqs(sr, n_fft))          # (n_bins, 1)
    f0_frames = match_env_frames(f0[None, ::hop], t_frames)[0]
    hp_mask = 1.0 / (1.0 + jnp.exp(
        -jnp.clip((freqs - f0_frames[None, :]) / 5.0, -60.0, 60.0)))

    if st.cut_subharm_below_f0:
        S_harm = S_harm * hp_mask
    env_m = match_env_frames(env_spec, t_frames)

    mag_harm = jnp.max(jnp.abs(S_harm) + 1e-8)
    boost = jnp.asarray(boost_curve(n_fft))
    S_harm = (S_harm / mag_harm) * env_m * boost

    bright_harm, bright_breath = brightness_curves(sr, n_fft)
    voiced_frames = match_env_frames(mask[None, ::hop], t_frames)[0]
    voiced_cols = (voiced_frames > 0)[None, :]

    if st.apply_brightness:
        S_v = gaussian_blur_complex_freq(
            S_harm * jnp.asarray(bright_harm), 0.5)
        S_harm = jnp.where(voiced_cols, S_v, S_harm)

    harmonic = istft(S_harm, hop, length=n)

    if st.need_noise:
        env_noise = match_env_frames(env4breath, t_frames)
        # random phases keyed per FRAME (fold_in(key, frame)): frame f's
        # draw is independent of the total frame count, so a
        # bucket-padded render produces the same noise as the unpadded
        # graph on the true frames
        phi = _frame_phases(k_phase, env_noise.shape[0], t_frames)
        U = jax.lax.complex(jnp.cos(phi), jnp.sin(phi))
        S_uv = U * env_noise
        if st.masked:
            S_uv = S_uv * frame_valid
        S_breath = S_uv * hp_mask

        if st.apply_brightness:
            S_bv = gaussian_blur_complex_freq(
                S_breath * jnp.asarray(bright_breath), 0.5)
            S_breath = jnp.where(voiced_cols, S_bv, S_breath)

        aper_breath = istft(S_breath, hop, length=n)

        mask_smooth = smooth_mask_downsampled(
            mask, sigma=st.noise_transition_smoothness, ds=4)
        aper_bre = aper_breath * mask_smooth * knobs["breath_strength"]
        if st.need_uv:
            aper_uv_raw = istft(S_uv, hop, length=n)
            aper_uv = aper_uv_raw * (1.0 - mask_smooth) \
                * knobs["uv_strength"]
        else:
            aper_uv = jnp.zeros_like(harmonic)
    else:
        aper_bre = jnp.zeros_like(harmonic)
        aper_uv = jnp.zeros_like(harmonic)

    if st.volume_jitter:
        hj = make_volume_jitter(k_vjh, n, sr, st.volume_jitter_speed,
                                knobs["volume_jitter_strength_harm"],
                                st.volume_vibrato)
        bj = make_volume_jitter(k_vjb, n, sr, st.volume_jitter_speed,
                                knobs["volume_jitter_strength_breath"],
                                st.volume_vibrato)
        vj_mask = gaussian_blur1d(mask, 20.0)
        harmonic = harmonic * (1.0 + (hj - 1.0) * vj_mask)
        aper_bre = aper_bre * (1.0 + (bj - 1.0) * vj_mask)

    if st.masked:
        harmonic = harmonic * valid_out
        aper_uv = aper_uv * valid_out
        aper_bre = aper_bre * valid_out

    combined = harmonic + aper_uv + aper_bre

    if st.roughness_on:
        harmonic_rough = vocal_roughness(
            k_rough, harmonic, f0, mask, sr,
            k_list=st.rough_k_list, h_list=st.rough_h_list,
            alpha=st.rough_alpha, hp_fc=st.rough_hp_fc,
            noise_amp=st.rough_noise_amp,
            noise_smooth_ms=st.rough_noise_smooth_ms,
            alpha_slew_ms=st.rough_alpha_slew_ms)
        if st.masked:
            harmonic_rough = harmonic_rough * valid_out
        combined = harmonic_rough + aper_uv + aper_bre

    norm_amt = jnp.clip(knobs["normalize"], 0.0, 1.0)
    peak = jnp.max(jnp.abs(combined)) + 1e-12
    gain = (1.0 / peak) ** norm_amt

    return combined * gain, harmonic * gain, aper_uv * gain, aper_bre * gain


_synth_core = partial(jax.jit, static_argnums=(0,))(synth_core_impl)


def _as_knob_arrays(knobs: dict) -> dict:
    out = {}
    for k, v in knobs.items():
        out[k] = jnp.asarray(v, dtype=jnp.float32)
    return out


def synthesize(st: SynthStatic, env_spec, f0_interp, voicing_mask,
               formants_array=None, knobs: dict | None = None, key=None):
    """Host-facing entry.  ``env_spec`` dense (n_bins, T); ``formants_array``
    (4, T) or None; returns (mix, harmonic, aper_uv, aper_bre) as device
    arrays of length ``st.n``."""
    full = default_knobs()
    if knobs:
        full.update(knobs)
    if key is None:
        key = jax.random.PRNGKey(0)
    if formants_array is None:
        t = np.asarray(env_spec).shape[1]
        formants_array = jnp.zeros((4, t), dtype=jnp.float32)
    if st.n == 0:
        raise ValueError("SynthStatic.n (output length) must be set")
    return _synth_core(st, jnp.asarray(env_spec), jnp.asarray(f0_interp),
                       jnp.asarray(voicing_mask),
                       jnp.asarray(formants_array, dtype=jnp.float32),
                       _as_knob_arrays(full), key)
