"""End-to-end tests of the resampler pipeline on a synthetic voicebank
sample (sawtooth vowel), covering the 13-arg UTAU protocol and the flag
chain."""
import numpy as np
import pytest

from goofer_tpu.sampler.resampler import GooferResampler, acquire_features
from goofer_tpu.utils.audio_io import read_wav, write_wav
from goofer_tpu import cli

SR = 44100
HOP = 256


def _make_sample(path, f0=220.0, dur=0.6):
    n = int(dur * SR)
    t = np.arange(n) / SR
    f_curve = np.full(n, f0)
    phase = np.cumsum(f_curve / SR)
    y = 0.35 * (2 * (phase % 1.0) - 1.0)
    # soften with a crude lowpass to look more voice-like
    y = np.convolve(y, np.ones(8) / 8.0, mode="same")
    # leading/trailing fricative-ish noise
    rng = np.random.default_rng(0)
    y[: n // 10] = 0.05 * rng.standard_normal(n // 10)
    y[-n // 10:] = 0.05 * rng.standard_normal(n // 10)
    write_wav(path, y.astype(np.float32), SR)
    return path


@pytest.fixture(scope="module")
def voicebank(tmp_path_factory):
    d = tmp_path_factory.mktemp("vb")
    wav = d / "a.wav"
    _make_sample(wav)
    return d


def _dominant_period(y, sr, fmin=80.0, fmax=600.0):
    y = y - y.mean()
    ac = np.correlate(y, y, "full")[len(y) - 1:]
    lo = int(sr / fmax)
    hi = int(sr / fmin)
    return lo + int(np.argmax(ac[lo:hi]))


def test_neutral_render_and_cache(voicebank):
    out = voicebank / "out_neutral.wav"
    GooferResampler(voicebank / "a.wav", out, "C4", 100, "g0",
                    0, 400, 100, 0, 100, 0, "!120", "AA")
    assert out.exists()
    assert (voicebank / "a_features.goofy").exists()
    y, sr = read_wav(out)
    assert sr == SR
    # length = consonant prefix + requested tail
    desired = int(0.4 * SR)
    pre = (int(0.1 * SR) // 1)
    assert abs(len(y) - (pre + desired)) <= 2
    assert np.all(np.isfinite(y))
    # rendered pitch should be C4 (261.63 Hz) in the sustained region
    seg = y[len(y) // 3: 2 * len(y) // 3]
    period = _dominant_period(seg, SR)
    f_est = SR / period
    assert abs(f_est - 261.63) / 261.63 < 0.03, f_est

    # second render hits the cache (and must produce the same length)
    out2 = voicebank / "out_neutral2.wav"
    GooferResampler(voicebank / "a.wav", out2, "A3", 100, "g0",
                    0, 400, 100, 0, 100, 0, "!120", "AA")
    y2, _ = read_wav(out2)
    assert len(y2) == len(y)
    period2 = _dominant_period(y2[len(y2) // 3: 2 * len(y2) // 3], SR)
    assert abs(SR / period2 - 220.0) / 220.0 < 0.03


def test_pitch_offset_and_volume(voicebank):
    out = voicebank / "out_t.wav"
    # t+100 = +1 semitone above C4
    GooferResampler(voicebank / "a.wav", out, "C4", 100, "t100",
                    0, 400, 100, 0, 50, 0, "!120", "AA")
    y, _ = read_wav(out)
    seg = y[len(y) // 3: 2 * len(y) // 3]
    f_est = SR / _dominant_period(seg, SR)
    want = 261.63 * 2 ** (1 / 12)
    assert abs(f_est - want) / want < 0.03, f_est


@pytest.mark.parametrize("loop_flag", ["L0", "L1", "L2"])
def test_sustain_loops_long_note(voicebank, loop_flag):
    out = voicebank / f"out_{loop_flag}.wav"
    # request a 1.2 s note from a 0.6 s sample -> sustain looping engages
    GooferResampler(voicebank / "a.wav", out, "C4", 100, loop_flag,
                    0, 1200, 100, 0, 100, 0, "!120", "AA")
    y, _ = read_wav(out)
    assert abs(len(y) - (int(0.1 * SR) + int(1.2 * SR))) <= 2
    # sustained pitch holds through the looped region
    seg = y[-int(0.3 * SR):]
    f_est = SR / _dominant_period(seg, SR)
    assert abs(f_est - 261.63) / 261.63 < 0.04, (loop_flag, f_est)


def test_reverse_flag(voicebank):
    out = voicebank / "out_rev.wav"
    GooferResampler(voicebank / "a.wav", out, "C4", 100, "R1",
                    0, 400, 100, 0, 100, 0, "!120", "AA")
    y, _ = read_wav(out)
    assert np.all(np.isfinite(y)) and np.max(np.abs(y)) > 0.01


def test_formant_and_envelope_flags(voicebank):
    out = voicebank / "out_formant.wav"
    GooferResampler(voicebank / "a.wav", out, "C4", 100,
                    "g-20fa10fb-10es30br20fw20fst30B20U-20V80P80",
                    0, 400, 100, 0, 100, 0, "!120", "AA")
    y, _ = read_wav(out)
    assert np.all(np.isfinite(y)) and np.max(np.abs(y)) > 0.01
    # pitch is unaffected by formant-domain flags
    seg = y[len(y) // 3: 2 * len(y) // 3]
    f_est = SR / _dominant_period(seg, SR)
    assert abs(f_est - 261.63) / 261.63 < 0.03


@pytest.mark.slow
def test_texture_flags_layers(voicebank):
    out = voicebank / "out_texture.wav"
    GooferResampler(voicebank / "a.wav", out, "C4", 100,
                    "sh30sr30sg40su50sd20", 0, 400, 100, 0, 100, 0,
                    "!120", "AA")
    y, _ = read_wav(out)
    assert np.all(np.isfinite(y)) and np.max(np.abs(y)) > 0.01


@pytest.mark.slow
def test_growl_fry_tension_aperiodic(voicebank):
    out = voicebank / "out_gft.wav"
    GooferResampler(voicebank / "a.wav", out, "C4", 100,
                    "sj30vf40vh60vl25st-30sa30pd40", 0, 400, 100, 0,
                    100, 0, "!120", "AA")
    y, _ = read_wav(out)
    assert np.all(np.isfinite(y)) and np.max(np.abs(y)) > 0.005


def test_velocity_prefix_stretch(voicebank):
    out = voicebank / "out_vel.wav"
    # velocity 50 -> prefix factor 2^(1-0.5) = 1.414: longer output
    GooferResampler(voicebank / "a.wav", out, "C4", 50, "",
                    0, 400, 100, 0, 100, 0, "!120", "AA")
    y, _ = read_wav(out)
    pre = int(0.1 * SR)
    pre_new = int(round(pre * 2 ** 0.5))
    assert abs(len(y) - (pre_new + int(0.4 * SR))) <= 2


def test_force_voiced_flag(voicebank):
    out = voicebank / "out_fv.wav"
    GooferResampler(voicebank / "a.wav", out, "C4", 100, "FV1",
                    0, 400, 0, 0, 100, 0, "!120", "AA")
    y, _ = read_wav(out)
    # with FV1 the unvoiced head is synthesized voiced -> strong periodicity
    head = y[: int(0.05 * SR)]
    assert np.max(np.abs(head)) > 0.01


def test_cli_render_and_modes(voicebank):
    out = voicebank / "out_cli.wav"
    rc = cli.main([str(voicebank / "a.wav"), str(out), "C4", "100", "g0",
                   "0", "400", "100", "0", "100", "0", "!120", "AA"])
    assert rc == 0 and out.exists()
    # bad arg count
    assert cli.main(["a.wav", "b.wav", "C4"]) == 1
    # malformed pitch string -> render failure, rc=1 (ref raises
    # ValueError "Bad b64" from the UTAU decoder)
    rc = cli.main([str(voicebank / "a.wav"), str(out), "C4", "100", "g0",
                   "0", "400", "100", "0", "100", "0", "!120", "A!"])
    assert rc == 1


def test_cli_folder_extraction(tmp_path):
    wav = tmp_path / "b.wav"
    _make_sample(wav, f0=150.0, dur=0.3)
    rc = cli.main([str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "b_features.goofy").exists()


def test_acquire_features_roundtrip(voicebank):
    env, f0i, vmask, forms, sr, ylen = acquire_features(
        voicebank / "a.wav", 1024, 256)
    assert env.shape[0] == 513
    assert len(f0i) == ylen
    assert sr == SR

def test_acquire_singleton_matches_direct_extraction(tmp_path):
    # acquire_features routes singletons through the BUCKETED batch
    # graph (round 5); the saved .goofy must match a direct
    # extract_features run on the same audio (the bucketed analysis is
    # bit-compatible with the per-file path).
    from goofer_tpu.analysis.features import extract_features
    from goofer_tpu.utils.audio_io import read_wav_mono

    wav = tmp_path / "s.wav"
    _make_sample(wav, f0=180.0, dur=0.4)
    env_a, f0_a, vm_a, forms_a, sr, ylen = acquire_features(wav, 1024, 256)
    assert ylen == len(read_wav_mono(wav)[0])

    y, sr2 = read_wav_mono(wav)
    env_d, f0_d, vm_d, forms_d, knots = extract_features(
        y, sr2, n_fft=1024, hop_length=256)
    assert sr == sr2
    assert env_a.shape == env_d.shape
    # fresh-extraction branch returns the DENSE env (knots only go to
    # the .goofy); bucketed batch-of-1 must match the per-file graph
    np.testing.assert_allclose(env_a, env_d, rtol=0, atol=1e-6)
    # the saved .goofy knot payload picks the same adaptive K
    from goofer_tpu.io.goofy import load_features

    env_saved = load_features(wav.parent / "s_features.goofy")[0]
    assert env_saved["knot_vals_log"].shape == knots["knot_vals_log"].shape
    np.testing.assert_allclose(f0_a, f0_d, rtol=0, atol=1e-4)
    np.testing.assert_array_equal(vm_a, vm_d)
    for k in forms_d:
        np.testing.assert_allclose(forms_a[k], forms_d[k],
                                   rtol=1e-4, atol=1e-2)
