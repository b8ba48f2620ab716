"""Note renderer: the full UTAU resample pipeline.

Equivalent of ``GooferResampler.render``/``resample``
(ref: SillySampler.py:415-1185).  The host computes index plans and scalar
parameters; all array math runs on device.  Up to four synthesis layers are
dispatched per note (main, ``su`` sub-octave, ``sj`` growl, ``sa``
aperiodic), then post-filters, fry blending, tension and mixing follow on
device, and the result is written as WAV.
"""
from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from goofer_tpu import config
from goofer_tpu.engine.synth import SynthStatic, synthesize
from goofer_tpu.io.goofy import (
    formants_to_int_keys,
    load_features,
    save_features,
)
from goofer_tpu.ops.envelope import (
    brightness_tilt,
    decode_env_from_knots,
    env_shape,
    formant_strength_gain,
    formant_width_warp,
    fry_env_shift,
)
from goofer_tpu.ops.filters import gaussian_blur1d, gaussian_kernel1d
from goofer_tpu.ops.interp import gather_lerp
from goofer_tpu.ops.jitter import volume_jitter
from goofer_tpu.ops.scan_iir import dynamic_butter_filter
from goofer_tpu.sampler.flags import NoteParams, midi_to_hz
from goofer_tpu.sampler.plan import (
    apply_frame_plan,
    plan_cut,
    plan_env_loop,
    plan_prefix_stretch,
    plan_sample_loop,
    plan_track_loop,
)
from goofer_tpu.utils.audio_io import read_wav_mono, write_wav

log = logging.getLogger("goofer_tpu")

SANITIZE_MIN_HZ = (120.0, 300.0, 1500.0, 2000.0)


def _np_gaussian1d(x: np.ndarray, sigma: float) -> np.ndarray:
    """Reference-style Gaussian smoothing on host (reflect pad)."""
    if sigma <= 0 or x.size == 0:
        return x.copy()
    k = gaussian_kernel1d(float(sigma)).astype(np.float64)
    radius = (len(k) - 1) // 2
    if radius <= 0:
        return x.copy()
    padded = np.pad(x.astype(np.float64), radius, mode="reflect")
    return np.convolve(padded, k, mode="valid")


def sanitize_formant_track(track: np.ndarray, t: int, sr: int,
                           min_hz: float, max_hz: float | None = None,
                           sigma_frames: float = 3) -> np.ndarray:
    """Repair out-of-range/NaN formant frames by interpolating from good
    ones, then smooth (ref: SillySampler.py:264-283)."""
    max_hz = max_hz or (sr * 0.48)
    x = np.array(track, dtype=np.float32, copy=True)
    if len(x) < t:
        x = np.pad(x, (0, t - len(x)), mode="edge")
    elif len(x) > t:
        x = x[:t]
    bad = (~np.isfinite(x)) | (x < min_hz) | (x > max_hz)
    if np.any(bad):
        good = np.where(~bad)[0]
        if good.size >= 2:
            gx = good.astype(np.float64)
            gy = x[~bad].astype(np.float64)
            pos = np.where(bad)[0].astype(np.float64)
            vals = np.interp(pos, gx, gy)
            sl = (gy[1] - gy[0]) / (gx[1] - gx[0] + 1e-10)
            sr_ = (gy[-1] - gy[-2]) / (gx[-1] - gx[-2] + 1e-10)
            vals = np.where(pos < gx[0], gy[0] + sl * (pos - gx[0]), vals)
            vals = np.where(pos > gx[-1], gy[-1] + sr_ * (pos - gx[-1]), vals)
            x[bad] = vals.astype(np.float32)
        elif good.size == 1:
            x[bad] = x[~bad][0]
        else:
            x = np.full_like(x, 300.0)
    if sigma_frames > 0:
        x = _np_gaussian1d(x, sigma_frames).astype(np.float32)
    return x


def _feature_path(in_file: Path) -> Path:
    return in_file.with_name(f"{in_file.stem}_features.goofy")


def _src_tag(feat_path: str) -> str:
    stem = Path(feat_path).name
    if stem.endswith("_features.goofy"):
        return stem[: -len("_features.goofy")]
    return Path(feat_path).stem


def invalidate_render_cache(out_path: str, feat_path: str) -> None:
    """Delete cached renders for a source after a voicing edit
    (ref: SillySampler.py:23-41)."""
    try:
        out_dir = Path(out_path).parent
        tag = _src_tag(feat_path)
        for p in out_dir.glob(f"{tag}*.wav"):
            try:
                p.unlink()
                log.info("[SE] Invalidated cache: %s", p.name)
            except Exception as e:  # pragma: no cover
                log.warning("[SE] Could not delete %s: %s", p, e)
        for ext in ("json", "txt", "lock"):
            for p in out_dir.glob(f"{tag}*.{ext}"):
                try:
                    p.unlink()
                except Exception:  # pragma: no cover
                    pass
    except Exception as e:  # pragma: no cover
        log.warning("[SE] Cache invalidate failed: %s", e)


def acquire_features(in_file: Path, n_fft: int, hop: int):
    """Load the .goofy cache or extract + save it
    (ref: SillySampler.py:415-432).  Returns dense env on device."""
    from goofer_tpu.analysis.features import extract_features

    feat = _feature_path(in_file)
    if feat.exists():
        log.info("Loading cached features")
        env, f0i, vmask, forms, sr, ylen = load_features(feat)
        if isinstance(env, dict) and env.get("mode") == "knots":
            env = np.asarray(decode_env_from_knots(
                jnp.asarray(env["knot_vals_log"], dtype=jnp.float32),
                env["sr"], env["n_fft"], env["n_bins"]))
    else:
        log.info("Extracting features")
        y, sr = read_wav_mono(in_file)
        env, f0i, vmask, forms, knots = extract_features(
            y, sr, n_fft=n_fft, hop_length=hop)
        ylen = len(y)
        save_features(feat, knots, f0i, vmask, forms, sr, ylen)
    return np.asarray(env, dtype=np.float32), f0i, vmask, forms, sr, ylen


class GooferResampler:
    """13-positional-arg UTAU resampler (ref: SillySampler.py:286-306).

    Constructing the object renders the note, like the reference.
    ``editor_hook(y_snip, sr, init_mask) -> mask|None`` replaces the
    blocking tkinter editor for SE1.
    """

    def __init__(self, in_file, out_file, pitch, velocity, flags="",
                 offset=0, length=1000, consonant=0, cutoff=0,
                 volume=100, modulation=0, tempo="!120", pitch_string="AA",
                 editor_hook=None, n_fft=config.SAMPLER_N_FFT,
                 hop=config.SAMPLER_HOP, seed: int = 0):
        self.in_file = Path(in_file)
        self.out_file = Path(out_file)
        self.params = NoteParams.from_args(
            pitch, velocity, flags, offset, length, consonant, cutoff,
            volume, modulation, tempo, pitch_string)
        self.editor_hook = editor_hook
        self.n_fft = n_fft
        self.hop = hop
        self.key = jax.random.PRNGKey(seed)
        self.render()

    # ------------------------------------------------------------------

    def render(self):
        from goofer_tpu.utils.profiling import (
            StageTimer,
            device_trace,
            profiling_enabled,
        )

        p = self.params
        timer = StageTimer(enabled=profiling_enabled())
        with device_trace():
            with timer.stage("features"):
                env, f0i, vmask, forms, sr, ylen = acquire_features(
                    self.in_file, self.n_fft, self.hop)

                forms = formants_to_int_keys(forms)
                if p.reverse:
                    log.info("Reversing features (R flag)")
                    env = env[:, ::-1]
                    f0i = f0i[::-1]
                    vmask = vmask[::-1]
                    forms = {k: np.asarray(forms[k])[::-1] for k in forms}

            with timer.stage("resample"):
                out = self.resample(env, f0i, vmask, forms, sr, ylen)
                out = np.asarray(out)

            with timer.stage("write"):
                log.info("Writing %s", self.out_file)
                write_wav(self.out_file, out, sr)
        if timer.enabled:
            timer.report(audio_seconds=len(out) / sr)

    # ------------------------------------------------------------------

    def _editor_roundtrip(self, mask_cut: np.ndarray, cut, sr, ylen):
        """SE1: run the voicing editor on the note snippet and write the
        edited mask back into the .goofy (ref: SillySampler.py:577-616)."""
        from goofer_tpu.editor.core import write_back_voicing

        p = self.params
        feat_path = str(_feature_path(self.in_file))
        y_src, _ = read_wav_mono(self.in_file)
        if p.reverse:
            y_src = y_src[::-1]
        y_snip = y_src[cut.start_sample:cut.end_sample].astype(np.float32)

        result = self.editor_hook(y_snip, sr, mask_cut.astype(np.float32))
        if result is not None and len(result) == len(mask_cut):
            edited = np.asarray(result, dtype=np.float32)
            write_back_voicing(feat_path, edited, cut.start_sample,
                               cut.end_sample, p.reverse, ylen)
            invalidate_render_cache(str(self.out_file), feat_path)
            return edited
        return mask_cut

    # ------------------------------------------------------------------

    def resample(self, env, f0i, vmask, forms, sr, ylen):
        p = self.params
        hop = self.hop
        sample_len_sec = ylen / sr

        cut = plan_cut(sample_len_sec, sr, hop, p.offset_sec,
                       p.consonant_sec, p.cutoff_sec, p.reverse)
        log.info("Interpolating features")

        env_cut = jnp.asarray(env[:, cut.start_frame:cut.end_frame])
        f0_cut = np.asarray(f0i[cut.start_sample:cut.end_sample],
                            dtype=np.float32)
        mask_cut = np.asarray(vmask[cut.start_sample:cut.end_sample],
                              dtype=np.float32)

        pre_frames = cut.consonant_frame - cut.start_frame
        tail_frames = cut.end_frame - cut.consonant_frame
        pre_samples = cut.consonant_sample - cut.start_sample
        tail_samples = cut.end_sample - cut.consonant_sample

        # --- frame-local envelope effects (br, es, fw) -----------------
        if p.brightness_env != 1.0 and env_cut.size:
            env_cut = brightness_tilt(env_cut, p.brightness_env, sr)
        if p.env_shape != 0.0 and env_cut.size:
            env_cut = env_shape(env_cut, p.env_shape)
        if p.formant_width != 0.0 and env_cut.size:
            env_cut = formant_width_warp(env_cut, p.formant_width)

        # --- SE editor + FV -------------------------------------------
        if p.use_editor and self.editor_hook is not None:
            mask_cut = self._editor_roundtrip(mask_cut, cut, sr, ylen)
        if p.force_voiced:
            mask_cut = np.ones_like(mask_cut)

        # --- sustain loops --------------------------------------------
        desired_tail_samples = int(p.length_sec * sr)
        desired_tail_frames = int(np.ceil(p.length_sec * sr / hop))

        env_plan = plan_env_loop(pre_frames, tail_frames,
                                 desired_tail_frames, p.loop_mode)
        env_new = apply_frame_plan(env_cut, env_plan, axis=-1)

        samp_plan = plan_sample_loop(pre_samples, tail_samples,
                                     desired_tail_samples)
        f0_new = apply_frame_plan(jnp.asarray(f0_cut), samp_plan, axis=-1)
        mask_new = apply_frame_plan(jnp.asarray(mask_cut), samp_plan,
                                    axis=-1)

        target_frames = len(env_plan)
        track_plan = plan_track_loop(pre_frames, tail_frames,
                                     desired_tail_frames, p.loop_mode)
        formants_new = {}
        for k in (1, 2, 3, 4):
            track = np.asarray(forms.get(k, np.zeros(1)), dtype=np.float32)
            track = track[cut.start_frame:cut.end_frame]
            if track.size == 0:
                track = np.zeros(1, dtype=np.float32)
            looped = np.asarray(apply_frame_plan(jnp.asarray(track),
                                                 track_plan, axis=-1))
            if len(looped) < target_frames:
                looped = np.pad(looped, (0, target_frames - len(looped)),
                                mode="edge")
            else:
                looped = looped[:target_frames]
            formants_new[k] = looped

        # --- consonant velocity ---------------------------------------
        vel = p.velocity_factor
        if abs(vel - 1.0) > 1e-6 and pre_frames > 1 and pre_samples > 1:
            fplan = plan_prefix_stretch(target_frames, pre_frames, vel)
            if fplan is not None:
                env_new = apply_frame_plan(env_new, fplan, axis=-1)
                new_target = len(fplan)
                for k in formants_new:
                    warped = np.asarray(apply_frame_plan(
                        jnp.asarray(formants_new[k]), fplan, axis=-1))
                    if len(warped) < new_target:
                        warped = np.pad(warped, (0, new_target - len(warped)),
                                        mode="edge")
                    formants_new[k] = warped[:new_target]
            splan = plan_prefix_stretch(
                int(f0_new.shape[0]), pre_samples, vel)
            if splan is not None:
                f0_new = apply_frame_plan(f0_new, splan, axis=-1)
                mask_new = apply_frame_plan(mask_new, splan, axis=-1)

        # --- formant strength bells -----------------------------------
        # Reference quirk preserved: tracks are first cut/padded to the
        # PRE-velocity frame count (canon_formants uses the stale
        # target_frames, ref: SillySampler.py:756,792), then sanitized to
        # the post-velocity count with edge padding.
        t_env = int(env_new.shape[1])

        def _canon_len(x, t):
            x = np.asarray(x, dtype=np.float32)
            if len(x) < t:
                return np.pad(x, (0, t - len(x)), mode="edge")
            return x[:t]

        tracks = np.stack([
            sanitize_formant_track(
                _canon_len(formants_new[k + 1], target_frames), t_env, sr,
                SANITIZE_MIN_HZ[k], sigma_frames=4)
            for k in range(4)])
        if any(abs(s) > 1e-6 for s in p.formant_strengths):
            gain = formant_strength_gain((env_new.shape[0], t_env),
                                         jnp.asarray(tracks),
                                         p.formant_strengths, sr)
            env_new = env_new * gain

        # --- pitch curve ----------------------------------------------
        n_total = int(f0_new.shape[0])
        bend = p.bend_cents.astype(np.float64)
        pitch_semi = bend / 100.0 + p.pitch_midi
        if p.t_cents:
            pitch_semi = pitch_semi + p.t_cents / 100.0
        tick_dt = 60.0 / (p.tempo * 96.0)
        t_samples = np.arange(n_total) / sr
        if len(pitch_semi) == 1:
            midi_curve = jnp.full((n_total,), float(pitch_semi[0]),
                                  dtype=jnp.float32)
        else:
            t_max = (len(pitch_semi) - 1) * tick_dt
            pos = np.clip(t_samples, 0.0, t_max) / tick_dt
            midi_curve = gather_lerp(
                jnp.asarray(pitch_semi, dtype=jnp.float32),
                jnp.asarray(pos, dtype=jnp.float32), axis=0)
        hz_curve = 440.0 * 2.0 ** ((midi_curve - 69.0) / 12.0)
        f0_new = mask_new * hz_curve

        # --- pitch-driven dynamics (pd) -------------------------------
        dyn_gain = None
        if p.pitch_dyn != 0.0:
            baseline = p.pitch_midi + (p.t_cents / 100.0)
            bend_semi = midi_curve - baseline
            sigma_samp = max(1, int(0.010 * sr))
            bend_s = gaussian_blur1d(bend_semi, float(sigma_samp))
            ref = jnp.percentile(jnp.abs(bend_s), 95.0) + 1e-8
            v = jnp.clip(bend_s / ref, -1.0, 1.0)
            signed = v if p.pitch_dyn > 0 else -v
            gain_db = 12.0 * abs(p.pitch_dyn) * signed
            dyn_gain = jnp.clip(10.0 ** (gain_db / 20.0), 1e-3, 1e3)
            vmask_s = gaussian_blur1d(mask_new, float(int(0.01 * sr)))
            dyn_gain = 1.0 + (dyn_gain - 1.0) * vmask_s

        # --- vocal fry ------------------------------------------------
        fry_mask = None
        vf = float(np.clip(p.fry_amount, -100.0, 100.0))
        if vf != 0.0:
            f0_new, fry_mask = self._apply_fry(f0_new, mask_new, n_total,
                                               sr, vf)
            if fry_mask is not None:
                frame_centers = np.minimum(
                    n_total - 1,
                    np.arange(t_env) * hop + hop // 2).astype(np.int64)
                fry_w_frames = jnp.asarray(fry_mask[frame_centers])
                env_new = fry_env_shift(env_new, fry_w_frames, 0.92)

        # --- synthesis layers -----------------------------------------
        log.info("Synthesizing")
        key = self.key
        k_main, k_su, k_sj, k_sa, k_sd, k_noise = jax.random.split(key, 6)

        st_main = SynthStatic(
            sr=sr, n_fft=self.n_fft, hop=hop, n=n_total,
            f0_jitter=p.f0_jitter,
            volume_jitter=p.volume_jitter,
            add_subharm=p.add_subharm,
            subharm_semitones=(12.0,),
            subharm_vibrato=True,
            subharm_vibrato_delay=0.01,
            cut_subharm_below_f0=True,
            warp_formants=any(s != 1.0 for s in p.f_shifts),
            formant_shift_on=p.formant_shift != 1.0,
        )
        main_knobs = {
            "formant_shift": p.formant_shift,
            "formant_band_shifts": np.asarray(p.f_shifts, dtype=np.float32),
            "f0_jitter_strength": p.f0_jitter_strength,
            "volume_jitter_strength_harm": p.volume_jitter_strength,
            "volume_jitter_strength_breath": p.volume_jitter_strength * 2,
            "subharm_weight": p.subharm_weight,
            "subharm_vibrato_rate": 75.0,
            "subharm_vibrato_depth": 3.0,
            "normalize": p.normalize,
        }
        tracks_j = jnp.asarray(tracks)
        _, harmonic, aper_uv, aper_bre = synthesize(
            st_main, env_new, f0_new, mask_new, tracks_j, main_knobs,
            key=k_main)

        st_layer = SynthStatic(
            sr=sr, n_fft=self.n_fft, hop=hop, n=n_total,
            warp_formants=st_main.warp_formants,
            formant_shift_on=st_main.formant_shift_on,
        )
        layer_knobs = {
            "formant_shift": p.formant_shift,
            "formant_band_shifts": np.asarray(p.f_shifts, dtype=np.float32),
            "normalize": p.normalize,
        }

        # su: sub-octave layer, doubly highpassed at max(f0, 120)
        if p.subharm_gain > 0.0:
            _, harm_sub, _, _ = synthesize(
                st_layer, env_new, f0_new * 0.5, mask_new, tracks_j,
                layer_knobs, key=k_su)
            f0_cut_hp = jnp.maximum(f0_new, 120.0)
            for _ in range(2):
                harm_sub = dynamic_butter_filter(
                    harm_sub, f0_cut_hp, sr, 1.0, order=6, btype="highpass")
            harmonic = harmonic + harm_sub * p.subharm_gain

        # sj: growl layer at noisy half f0
        if p.growl_mix > 0.0:
            noise = p.growl_mix ** 2 * jax.random.normal(
                k_noise, (n_total,), dtype=jnp.float32)
            f0_layer = f0_new * (0.5 * 2.0 ** noise)
            _, harm_gw, _, _ = synthesize(
                st_layer, env_new, f0_layer, mask_new, tracks_j,
                layer_knobs, key=k_sj)
            f0_for_hp = jnp.maximum(f0_new, 120.0)
            for _ in range(2):
                harm_gw = dynamic_butter_filter(
                    harm_gw, f0_for_hp, sr, 1.0, order=6, btype="highpass")
            harmonic = (1.0 - p.growl_mix) * harmonic \
                + p.growl_mix * harm_gw

        # fry: highpass blend under the fry mask
        if fry_mask is not None:
            ones = jnp.ones_like(f0_new)
            harm_hp = dynamic_butter_filter(harmonic, ones, sr, 200.0,
                                            order=6, btype="highpass")
            bre_hp = dynamic_butter_filter(aper_bre, ones, sr, 200.0,
                                           order=6, btype="highpass")
            fm = jnp.asarray(fry_mask)
            harmonic = harmonic * (1.0 - fm) + harm_hp * fm
            aper_bre = aper_bre * (1.0 - fm) + bre_hp * fm

        # sd: dryness (breath-only vibrato jitter + gain)
        if p.sd_strength > 0:
            breath_j = volume_jitter(k_sd, n_total, sr, speed=150.0,
                                     strength=p.sd_strength / 200.0,
                                     vibrato=True)
            vmask_smooth = gaussian_blur1d(mask_new, 20.0)
            aper_bre = aper_bre * (1.0 + (breath_j - 1.0) * vmask_smooth)
            aper_bre = aper_bre * (1.0 + (p.sd_strength / 100.0) * 10)

        # st: tension filter games, RMS preserved
        if p.tension != 0:
            harmonic, aper_bre = self._apply_tension(
                harmonic, aper_bre, f0_new, sr, p.tension)

        # final mix
        out = (harmonic * p.harmonic_mix + aper_bre * p.breathiness_mix
               + aper_uv * p.unvoiced_mix) * p.volume

        # sa: uncorrelated aperiodic blend
        if p.aperiodic_mix > 0.0:
            st_ap = SynthStatic(
                sr=sr, n_fft=self.n_fft, hop=hop, n=n_total,
                warp_formants=st_main.warp_formants,
                formant_shift_on=st_main.formant_shift_on,
                noise_transition_smoothness=1.0,
            )
            ap_knobs = dict(layer_knobs)
            ap_knobs.update({"uv_strength": 1.0, "breath_strength": 1.0})
            _, _, uv_u, bre_u = synthesize(
                st_ap, env_new, f0_new, jnp.ones_like(mask_new), tracks_j,
                ap_knobs, key=k_sa)
            mix = p.aperiodic_mix
            out = out * (1.0 - mix) + (uv_u + bre_u) * p.volume * mix

        if dyn_gain is not None:
            out = out * dyn_gain

        return out

    # ------------------------------------------------------------------

    def _apply_fry(self, f0_new, mask_new, n, sr, vf):
        """Fry F0 override + glide and the faded fry region mask
        (ref: SillySampler.py:883-965).  Returns (f0, fry_mask|None)."""
        p = self.params
        vh = p.fry_base_hz
        vl = p.fry_glide_pct

        base_w = np.zeros(n, dtype=np.float32)
        if vf > 0:
            L = int(round(n * (vf / 100.0)))
            if L > 0:
                glide = int(np.clip(int(round(L * (vl / 100.0))), 0, L))
                const = L - glide
                base_w[:const] = 1.0
                if glide > 0:
                    w = np.linspace(0.0, 1.0, glide, endpoint=True)
                    base_w[const:L] = 1.0 - w
        else:
            L = int(round(n * (abs(vf) / 100.0)))
            if L > 0:
                glide = int(np.clip(int(round(L * (vl / 100.0))), 0, L))
                const = L - glide
                start = n - L
                if glide > 0:
                    w = np.linspace(1.0, 0.0, glide, endpoint=True)
                    base_w[start:start + glide] = 1.0 - w
                if const > 0:
                    base_w[start + glide:] = 1.0

        bw = jnp.asarray(base_w)
        fry_base = vh * (mask_new > 0).astype(jnp.float32)
        f0_out = (1.0 - bw) * f0_new + bw * fry_base

        # faded region mask (note: sized from the note midpoint,
        # ref: SillySampler.py:937-965)
        mid = n // 2
        if vf > 0:
            L2 = int(round(mid * (vf / 100.0)))
            s_i, e_i = 0, max(0, min(n, L2))
        else:
            L2 = int(round((n - mid) * (abs(vf) / 100.0)))
            s_i, e_i = max(0, n - L2), n
        fry_mask = None
        if e_i > s_i:
            fm = np.zeros(n, dtype=np.float32)
            fm[s_i:e_i] = 1.0
            fade = int(0.01 * sr)
            if fade > 0:
                a1 = min(e_i, s_i + fade)
                if a1 > s_i:
                    fm[s_i:a1] *= np.linspace(0.0, 1.0, a1 - s_i,
                                              endpoint=True)
                b0 = max(s_i, e_i - fade)
                if e_i > b0:
                    fm[b0:e_i] *= np.linspace(1.0, 0.0, e_i - b0,
                                              endpoint=True)
            fry_mask = fm
        return f0_out, fry_mask

    @staticmethod
    def _apply_tension(harmonic, aper_bre, f0_new, sr, tension):
        """st flag (ref: SillySampler.py:1114-1140)."""
        from goofer_tpu.ops.scan_iir import dynamic_butter_filter as dbf

        rms_before = jnp.sqrt(jnp.mean((harmonic + aper_bre) ** 2) + 1e-12)
        abs_ten = abs(tension)
        if tension < 0:
            order = int(np.clip(np.round(1 + abs_ten * 4), 1, 6))
            lp_factor = 2.0 - abs_ten * 0.75
            harmonic = dbf(harmonic, f0_new, sr, lp_factor, order=order,
                           btype="lowpass")
            aper_bre = dbf(aper_bre, f0_new, sr, abs_ten, order=4,
                           btype="highpass")
        else:
            highpassed = dbf(harmonic, f0_new, sr, abs_ten * 4, order=4,
                             btype="highpass")
            harmonic = harmonic + highpassed * (1.0 + abs_ten * 20.0)
            lp_factor = (2.0 - abs_ten) / 0.5
            aper_bre = dbf(aper_bre, f0_new, sr, lp_factor, order=6,
                           btype="lowpass")
            aper_bre = aper_bre * (1.0 - abs_ten)
        rms_after = jnp.sqrt(jnp.mean((harmonic + aper_bre) ** 2) + 1e-12)
        gain = jnp.where(rms_after > 0, rms_before / rms_after, 1.0)
        return harmonic * gain, aper_bre * gain
