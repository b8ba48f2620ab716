"""Smoke + semantics tests for the GOOFER.py-compatible facade."""
import numpy as np
import pytest

import goofer_tpu.compat as gf
from tests import oracles as o

RNG = np.random.default_rng(8)


def test_caches_and_curves():
    win = gf.get_cached_window(44100, 1024)
    assert win.shape == (1024,)
    np.testing.assert_allclose(win, np.hanning(1024) ** 0.5, atol=1e-6)
    freqs = gf.get_cached_freqs(44100, 1024)
    assert freqs.shape == (513, 1)
    boost = gf.get_cached_boost(44100, 1024)
    assert boost[0, 0] == 1.0 and boost[-1, 0] == 100.0
    bh, bb = gf.get_cached_brightness(44100, 1024)
    assert bh.shape == bb.shape == (513, 1)
    assert bb[-1, 0] == pytest.approx(10.0, rel=1e-5)  # +20 dB


def test_interp1d_matches_reference_semantics():
    x = np.array([0.0, 1.0, 3.0])
    y = np.array([0.0, 2.0, 1.0])
    f = gf.interp1d(x, y)
    np.testing.assert_allclose(f(np.array([-1.0, 0.5, 2.0, 4.0])),
                               [-2.0, 1.0, 1.5, 0.5], atol=1e-6)
    f0 = gf.interp1d(x, y, fill_value=0)
    np.testing.assert_allclose(f0(np.array([-1.0, 0.5, 4.0])),
                               [0.0, 1.0, 0.0], atol=1e-6)
    fs = gf.interp1d([2.0], [7.0])
    np.testing.assert_allclose(fs(np.array([0.0, 5.0])), [7.0, 7.0])


def test_gaussian_filters():
    x = RNG.standard_normal(300)
    np.testing.assert_allclose(gf.gaussian_filter1d(x, 3.0),
                               o.o_gaussian1d(x, 3.0), rtol=1e-4, atol=1e-5)
    m = RNG.standard_normal((40, 30))
    got = gf.gaussian_filter(m, (2.0, 1.0))
    want = o.o_gaussian1d(o.o_gaussian1d(m, 2.0, axis=0), 1.0, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_stft_istft_roundtrip():
    x = RNG.standard_normal(4000).astype(np.float32)
    S = gf.stft(x, n_fft=512, hop_length=128)
    y = gf.istft(S, hop_length=128, length=4000)
    np.testing.assert_allclose(y[512:-512], x[512:-512], atol=1e-3)


def test_pulse_train_compat_name():
    # 220.3 avoids exact integer phase-crossing ties vs the f64 oracle
    f0 = np.full(6000, 220.3, dtype=np.float32)
    f0[:500] = 0
    got = gf.pulse_train_numba(f0, 44100)
    want = o.o_pulse_train(f0, 44100)
    assert np.max(np.abs(got - want)) < 5e-3


def test_lf_model_pulse_shape():
    p = gf.lf_model_pulse(1 / 220.0, Ra=0.02, Rg=1.7, Rk=1.0)
    T0 = int(round(44100 / 220.0))
    assert len(p) == T0
    want = o.o_pulse_buf(T0, 1 / 220.0, 0.02, 1.7, 1.0, guard=False)
    np.testing.assert_allclose(p, want, atol=1e-5)
    assert np.max(np.abs(p)) == pytest.approx(1.0)


def test_knot_codec_surface():
    env = (np.exp(-np.linspace(0, 5, 513))[:, None]
           * np.ones((1, 10)) + 1e-4).astype(np.float32)
    pack = gf.compress_env_to_knots(env, 44100, 1024)
    dec = gf.decode_env_from_knots(pack)
    assert dec.shape == (513, 10)
    env_s = o.o_gaussian1d(env, 0.5, axis=0)
    assert np.max(np.abs(dec - env_s) / (env_s + 1e-8)) < 2e-2


def test_formant_transpose():
    tracks = {1: [700.0, 710.0], 2: [1200.0, 1190.0]}
    out = gf.transpose_formants(tracks, {1: 1.1})
    np.testing.assert_allclose(out[1], [770.0, 781.0])
    np.testing.assert_allclose(out[2], [1200.0, 1190.0])
    arr = np.array([[700.0], [1200.0], [2500.0], [3600.0]])
    out2 = gf.transpose_formants_array(arr, [1.1, 1.0, 0.9, 1.0])
    np.testing.assert_allclose(out2[:, 0], [770.0, 1200.0, 2250.0, 3600.0])


def test_misc_utils():
    assert gf.rms(np.array([3.0, 4.0])) == pytest.approx(
        np.sqrt(12.5 + 1e-12))
    f0 = np.array([100, 0, 0, 120], dtype=np.float32)
    fixed = gf.fix_f0_gaps(f0, 4)
    assert fixed[1] > 0 and fixed[2] > 0
    j = gf.create_volume_jitter(2000, 44100, vibrato=True, strength=0.2)
    assert np.all(j >= 0.5) and np.all(j <= 1.5)
    n = gf.make_smooth_noise(3000, 44100, seed=7)
    assert len(n) == 3000
    hp = gf.one_pole_highpass(np.ones(100, np.float32), 44100, 300.0)
    want = o.o_one_pole_hp(np.ones(100), 44100, 300.0)
    np.testing.assert_allclose(hp, want, atol=1e-4)


def test_synthesize_via_compat_surface():
    sr, n_fft, hop = 44100, 1024, 256
    n = 8000
    t_frames = 1 + n // hop
    env = (np.exp(-np.linspace(0, 5, 513))[:, None]
           * np.ones((1, t_frames)) + 1e-5).astype(np.float32)
    f0 = np.full(n, 220.0, dtype=np.float32)
    mask = np.ones(n, dtype=np.float32)
    y = np.zeros(n, dtype=np.float32)
    mix, harm, uv, bre = gf.synthesize(env, f0, mask, y, sr,
                                       n_fft=n_fft, hop_length=hop)
    assert mix.shape == (n,)
    assert np.max(np.abs(mix)) == pytest.approx(1.0, abs=1e-3)


def test_stretch_feature():
    x = np.arange(10, dtype=np.float32)
    out = gf.stretch_feature(x, 2.0)
    assert len(out) == 20
    m = RNG.standard_normal((3, 10)).astype(np.float32)
    assert gf.stretch_feature(m, 0.5).shape == (3, 5)
    np.testing.assert_allclose(gf.stretch_feature(x, 1.0), x)


def test_interp1d_matches_ops_extrapolation():
    """compat.interp1d (host NumPy facade) and ops/interp's device
    versions restate the same reference arithmetic (GOOFER.py:173-239);
    pin them together at interior, exact-boundary and outside inputs so
    they cannot silently diverge (VERDICT r2 weak item 8)."""
    import numpy as np

    from goofer_tpu.compat import interp1d
    from goofer_tpu.ops.interp import linear_interp, linear_interp_extrap

    x = np.array([0.0, 1.0, 2.5, 7.0], dtype=np.float64)
    y = np.array([1.0, -2.0, 0.5, 4.0], dtype=np.float64)
    # agreement contract holds at f32-REPRESENTABLE inputs: the device
    # path computes in f32, so an f64 probe infinitesimally past a
    # boundary (7.0 + 1e-9) classifies inside on device and outside on
    # host — probe the true f32 neighbors instead
    # (and XLA flushes f32 denormals, so the below-zero probe must be a
    # NORMAL float, not nextafter(0, -1))
    probes = np.array([-3.0, -1e-6, 0.0, 0.5,
                       1.0, 2.5, 6.999999, 7.0,
                       np.nextafter(np.float32(7), 8), 12.0],
                      dtype=np.float32)

    f = interp1d(x, y, fill_value="extrapolate")
    np.testing.assert_allclose(
        f(probes), np.asarray(linear_interp_extrap(x, y, probes)),
        rtol=1e-6, atol=1e-9)

    g = interp1d(x, y, fill_value=-5.0)
    np.testing.assert_allclose(
        g(probes), np.asarray(linear_interp(x, y, probes, fill_value=-5.0)),
        rtol=1e-6, atol=1e-9)
