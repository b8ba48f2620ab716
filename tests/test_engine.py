import numpy as np
import pytest
import jax
import jax.numpy as jnp

from goofer_tpu.engine import SynthStatic, synthesize
from tests import oracles as o

SR = 44100
N_FFT = 1024
HOP = 256
RNG = np.random.default_rng(21)


def _features(n):
    """Synthetic features: smooth env, glide f0 with an unvoiced gap."""
    t_frames = 1 + n // HOP
    n_bins = N_FFT // 2 + 1
    base = np.exp(-np.linspace(0, 5, n_bins))[:, None]
    wob = 1.0 + 0.4 * np.sin(np.linspace(0, 15, n_bins))[:, None]
    drift = 1.0 + 0.2 * np.sin(np.linspace(0, 4, t_frames))[None, :]
    env = (base * wob * drift + 1e-5).astype(np.float32)

    t = np.arange(n) / SR
    f0 = (200.0 * 2 ** (0.2 * np.sin(2 * np.pi * 1.5 * t))).astype(np.float32)
    f0[int(0.55 * n): int(0.7 * n)] = 0.0
    mask = (f0 > 75).astype(np.float32)
    return env, f0, mask


def _lsd_db(a, b, eps=1e-7):
    """Log-spectral distance between two waveforms, dB."""
    win = np.hanning(N_FFT) ** 0.5
    Sa = np.abs(o.o_stft(a.astype(np.float32), N_FFT, HOP, win)) + eps
    Sb = np.abs(o.o_stft(b.astype(np.float32), N_FFT, HOP, win)) + eps
    d = 20 * np.log10(Sa) - 20 * np.log10(Sb)
    return float(np.sqrt(np.mean(d ** 2)))


def test_harmonic_stem_matches_oracle_exactly():
    """With noise strengths zeroed the whole graph is deterministic; the
    harmonic stem must match the sequential oracle to float accuracy."""
    n = 24000
    env, f0, mask = _features(n)
    st = SynthStatic(sr=SR, n_fft=N_FFT, hop=HOP, n=n)
    mix, harm, uv, bre = synthesize(
        st, env, f0, mask,
        knobs={"uv_strength": 0.0, "breath_strength": 0.0})
    mix, harm = np.asarray(mix), np.asarray(harm)
    assert np.all(np.asarray(uv) == 0) and np.all(np.asarray(bre) == 0)

    o_mix, o_harm, _, _ = o.o_synthesize(
        env, f0, mask, n, SR, N_FFT, HOP,
        uv_strength=0.0, breath_strength=0.0, rng=None)
    # same peak-normalized harmonic stem
    scale = np.max(np.abs(o_harm)) / max(np.max(np.abs(harm)), 1e-12)
    np.testing.assert_allclose(harm * scale, o_harm, atol=2e-3)
    assert _lsd_db(harm, o_harm) < 0.1


def test_full_mix_lsd_parity_with_oracle():
    """Noise realizations differ (jax vs numpy RNG) but the spectral
    envelope of the mix must agree within the 1 dB LSD budget."""
    n = 24000
    env, f0, mask = _features(n)
    st = SynthStatic(sr=SR, n_fft=N_FFT, hop=HOP, n=n)
    mix, _, _, _ = synthesize(st, env, f0, mask,
                              key=jax.random.PRNGKey(5))
    o_mix, _, _, _ = o.o_synthesize(env, f0, mask, n, SR, N_FFT, HOP,
                                    rng=np.random.default_rng(9))
    # Smoothed-LSD parity metric; the reference against itself with two
    # noise seeds measures ~0.83 dB under this metric (see utils/metrics.py)
    from goofer_tpu.utils.metrics import lsd_db

    lsd = lsd_db(np.asarray(mix), o_mix, SR, N_FFT, HOP)
    assert lsd < 1.0, lsd


def test_stems_sum_to_mix():
    n = 12000
    env, f0, mask = _features(n)
    st = SynthStatic(sr=SR, n_fft=N_FFT, hop=HOP, n=n)
    mix, harm, uv, bre = synthesize(st, env, f0, mask)
    np.testing.assert_allclose(np.asarray(mix),
                               np.asarray(harm + uv + bre), atol=1e-5)


def test_normalize_exponent_semantics():
    n = 12000
    env, f0, mask = _features(n)
    st = SynthStatic(sr=SR, n_fft=N_FFT, hop=HOP, n=n)
    key = jax.random.PRNGKey(1)
    mix1, _, _, _ = synthesize(st, env, f0, mask, knobs={"normalize": 1.0},
                               key=key)
    mix0, _, _, _ = synthesize(st, env, f0, mask, knobs={"normalize": 0.0},
                               key=key)
    # P=1 -> peak exactly 1; P=0 -> unnormalized
    assert abs(float(jnp.max(jnp.abs(mix1))) - 1.0) < 1e-4
    peak0 = float(jnp.max(jnp.abs(mix0)))
    assert abs(peak0 - 1.0) > 1e-3  # whatever it is, it isn't re-scaled
    # and the two mixes are proportional (checked away from silence)
    m0, m1 = np.asarray(mix0), np.asarray(mix1)
    sel = np.abs(m1) > 0.01
    np.testing.assert_allclose(m0[sel] / m1[sel], peak0, rtol=1e-3)


def test_knob_change_does_not_retrace():
    from goofer_tpu.engine.synth import _synth_core

    n = 8000
    env, f0, mask = _features(n)
    st = SynthStatic(sr=SR, n_fft=N_FFT, hop=HOP, n=n)
    synthesize(st, env, f0, mask, knobs={"pitch_shift": 1.0})
    misses0 = _synth_core._cache_size()
    synthesize(st, env, f0, mask, knobs={"pitch_shift": 1.5,
                                         "breath_strength": 0.4})
    assert _synth_core._cache_size() == misses0


def test_pitch_shift_knob_shifts_f0():
    n = 24000
    env, f0, mask = _features(n)
    f0[:] = np.where(f0 > 0, 200.0, 0.0)
    st = SynthStatic(sr=SR, n_fft=N_FFT, hop=HOP, n=n)
    _, harm, _, _ = synthesize(st, env, f0, mask,
                               knobs={"pitch_shift": 1.5,
                                      "uv_strength": 0.0,
                                      "breath_strength": 0.0})
    harm = np.asarray(harm)[2000:20000]
    # autocorrelation period should be sr/300
    ac = np.correlate(harm, harm, "full")[len(harm) - 1:]
    period = int(round(SR / 300.0))
    lo = int(period * 0.8)
    hi = int(period * 1.2)
    peak_lag = lo + int(np.argmax(ac[lo:hi]))
    assert abs(peak_lag - period) <= 2


@pytest.mark.slow
def test_subharm_and_texture_paths_run():
    n = 12000
    env, f0, mask = _features(n)
    st = SynthStatic(sr=SR, n_fft=N_FFT, hop=HOP, n=n,
                     f0_jitter=True, volume_jitter=True, add_subharm=True,
                     subharm_semitones=(12.0,), subharm_vibrato=True,
                     roughness_on=True)
    mix, harm, uv, bre = synthesize(
        st, env, f0, mask,
        knobs={"subharm_weight": 0.75, "f0_jitter_strength": 0.5,
               "volume_jitter_strength_harm": 0.5,
               "volume_jitter_strength_breath": 1.0})
    for s in (mix, harm, uv, bre):
        arr = np.asarray(s)
        assert np.all(np.isfinite(arr))
    assert float(jnp.max(jnp.abs(mix))) > 0
