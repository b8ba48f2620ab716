"""Fuzz the flag/arg decode: sampler.flags.NoteParams (production) vs
tests.oracles.o_decode_params (the reference restatement,
SillySampler.py:286-411) must derive identical parameters for ANY flag
string — including unknown flags, missing values, duplicates, '/'
separators and negative values.
"""
import numpy as np
import pytest

from goofer_tpu.sampler.flags import NoteParams
from tests.oracles import o_decode_params

FLAG_KEYS = ["g", "br", "fa", "fb", "fc", "fd", "sh", "sr", "sd", "B",
             "U", "V", "L", "st", "sg", "R", "sj", "sa", "su", "P",
             "es", "FV", "pd", "fw", "fst", "fsta", "fstb", "fstc",
             "fstd", "t", "vf", "vh", "vl", "SE", "Mt", "xx", "q"]


def _random_flag_string(rng):
    parts = []
    for _ in range(rng.integers(0, 9)):
        k = FLAG_KEYS[rng.integers(len(FLAG_KEYS))]
        if rng.random() < 0.15:
            parts.append(k)                      # bare flag, no value
        else:
            parts.append(f"{k}{rng.integers(-120, 121)}")
        if rng.random() < 0.1:
            parts.append("/")                    # UTAU separator noise
    return "".join(parts)


def _compare(flags, pitch="C4", velocity=100, offset=10.0, length=500,
             consonant=40, cutoff=5, volume=90, modulation=30,
             tempo="!133", pitch_string="AA"):
    p = NoteParams.from_args(pitch, velocity, flags, offset, length,
                             consonant, cutoff, volume, modulation,
                             tempo, pitch_string)
    d = o_decode_params(pitch, velocity, flags, offset, length,
                        consonant, cutoff, volume, modulation, tempo,
                        pitch_string)
    ctx = flags
    assert p.pitch_midi == d["pitch_m"], ctx
    assert p.offset_sec == pytest.approx(d["offset"]), ctx
    assert p.length_sec == pytest.approx(d["length"]), ctx
    assert p.consonant_sec == pytest.approx(d["consonant"]), ctx
    assert p.cutoff_sec == pytest.approx(d["cutoff"]), ctx
    assert p.volume == pytest.approx(d["volume"]), ctx
    assert p.tempo == pytest.approx(d["tempo"]), ctx
    np.testing.assert_allclose(p.bend_cents, d["bend"], err_msg=ctx)
    assert p.formant_shift == pytest.approx(d["formant_shift"]), ctx
    assert p.brightness_env == pytest.approx(d["brightness_env"]), ctx
    assert tuple(p.f_shifts) == pytest.approx(tuple(d["f_shifts"])), ctx
    assert p.f0_jitter == d["f0_jitter_on"], ctx
    assert p.f0_jitter_strength == pytest.approx(
        d["f0_jitter_strength"]), ctx
    assert p.volume_jitter == d["volume_jitter_on"], ctx
    assert p.volume_jitter_strength == pytest.approx(
        d["volume_jitter_strength"]), ctx
    assert p.sd_strength == pytest.approx(d["sd_strength"]), ctx
    assert p.breathiness_mix == pytest.approx(d["breathiness_mix"]), ctx
    assert p.unvoiced_mix == pytest.approx(d["unvoiced_mix"]), ctx
    assert p.harmonic_mix == pytest.approx(d["harmonic_mix"]), ctx
    assert p.loop_mode == d["loop_mode"], ctx
    assert p.tension == pytest.approx(d["tension"]), ctx
    assert p.subharm_weight == pytest.approx(d["subharm_weight"]), ctx
    assert p.add_subharm == d["add_subharm"], ctx
    assert p.reverse == d["reverse"], ctx
    assert p.growl_mix == pytest.approx(d["growl_mix"]), ctx
    assert p.aperiodic_mix == pytest.approx(d["aperiodic_mix"]), ctx
    assert p.subharm_gain == pytest.approx(d["subharm_gain"]), ctx
    assert p.normalize == pytest.approx(d["normalize"]), ctx
    assert p.env_shape == pytest.approx(d["env_shape_amt"]), ctx
    assert p.force_voiced == d["force_voiced"], ctx
    assert p.pitch_dyn == pytest.approx(d["pitch_dyn"]), ctx
    assert p.formant_width == pytest.approx(d["formant_width"]), ctx
    assert tuple(p.formant_strengths) == pytest.approx(
        tuple(d["strengths"])), ctx
    assert p.t_cents == pytest.approx(d["t_cents"]), ctx
    assert p.fry_amount == pytest.approx(d["vf"]), ctx
    assert p.fry_base_hz == pytest.approx(d["vh_val"]), ctx
    assert p.fry_glide_pct == pytest.approx(d["vl"]), ctx
    assert p.use_editor == d["use_editor"], ctx


def test_known_quirks():
    # bare flags (no value -> None), '/' stripping, case-insensitive
    # lookups for se/l/es/pd/fst*, V clipping, negative cutoff
    for flags in ["", "g", "B", "V200", "V-50", "se1", "SE1", "l1", "L2",
                  "es-100", "pd101", "fst-200fsta300", "vf-100vh0vl200",
                  "sh0", "sr-5", "sj-10", "sa200", "su120", "P-5",
                  "R1g20/br-40", "t-120", "FV1", "q99xx3"]:
        _compare(flags)
    # negative cutoff changes the end-sample math upstream; decode-wise
    # it just passes through
    _compare("g10", cutoff=-150)


def test_fuzz_decode_parity():
    rng = np.random.default_rng(123)
    for _ in range(300):
        _compare(_random_flag_string(rng))


def test_fuzz_with_pitch_strings():
    from tests.fixtures_common import encode_pitch_string

    rng = np.random.default_rng(7)
    for _ in range(20):
        cents = rng.integers(-1500, 1500, size=rng.integers(1, 30))
        ps = encode_pitch_string(cents)
        _compare(_random_flag_string(rng), pitch_string=ps)
