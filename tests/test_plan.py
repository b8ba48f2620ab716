import numpy as np
import jax.numpy as jnp
import pytest

from goofer_tpu.sampler import plan as plan_mod
from goofer_tpu.sampler.flags import NoteParams, parse_flags, note_to_midi
from goofer_tpu.sampler.pitchstring import pitch_string_to_cents
from tests import oracles as o

RNG = np.random.default_rng(5)


# ------------------------------------------------------------------ flags

def test_parse_flags():
    assert parse_flags("g-20B30") == {"g": -20, "B": 30}
    assert parse_flags("g0/FV1L2") == {"g": 0, "FV": 1, "L": 2}
    assert parse_flags("SE1fsta50") == {"SE": 1, "fsta": 50}
    assert parse_flags("R") == {"R": None}


def test_note_to_midi():
    assert note_to_midi("C4") == 60
    assert note_to_midi("A4") == 69
    assert note_to_midi("C#-1") == 1


def test_noteparams_decode():
    p = NoteParams.from_args(
        "C4", 120, "g-20B30sh40L1R1P50fst-30fsta10vf60vh80vl25t-35",
        offset=100, length=2000, consonant=50, cutoff=-700, volume=80,
        modulation=40, tempo="!150", pitch_string="AA")
    assert p.pitch_midi == 60
    assert p.formant_shift == 1.0 - 20 / 200.0
    assert p.breathiness_mix == 1.3
    assert p.f0_jitter and p.f0_jitter_strength == 40 / 50.0
    assert p.loop_mode == "avg"
    assert p.reverse
    assert p.normalize == 0.5
    assert p.formant_strengths[0] == pytest.approx(
        np.clip(-0.3 + 0.1, -1, 1))
    assert p.formant_strengths[1] == pytest.approx(-0.3)
    assert p.fry_amount == 60 and p.fry_base_hz == 80 and p.fry_glide_pct == 25
    assert p.t_cents == -35
    assert p.offset_sec == 0.1 and p.cutoff_sec == -0.7
    assert p.velocity_factor == pytest.approx(2 ** (1 - 1.2))
    assert p.volume == pytest.approx(0.8)
    assert p.tempo == 150.0


def test_pitch_string_decode():
    # 'AA' = 0; RLE: two values then '#3#' repeats the last one 3 times
    assert pitch_string_to_cents("AA").tolist() == [0.0]
    arr = pitch_string_to_cents("ABAC#3#AD")
    assert len(arr) == 2 + 3 + 1
    assert arr[1] == arr[2] == arr[3] == arr[4]
    # 12-bit signed decoding: '//' = 4095 -> -1
    assert pitch_string_to_cents("//").tolist() == [-1.0]


# ------------------------------------------------------------------- cuts

def test_plan_cut_forward_and_negative_cutoff():
    c = plan_mod.plan_cut(2.0, 44100, 256, offset_sec=0.1,
                          consonant_sec=0.05, cutoff_sec=0.7,
                          reverse=False)
    assert c.start_sample == 4410
    assert c.consonant_sample == 4410 + 2205
    assert c.end_sample == int(1.3 * 44100)
    c2 = plan_mod.plan_cut(2.0, 44100, 256, offset_sec=0.1,
                           consonant_sec=0.05, cutoff_sec=-0.7,
                           reverse=False)
    assert c2.end_sample == int(0.8 * 44100)


def test_plan_cut_reverse_mirrors_window():
    # reversed: the same span measured from the other end
    c = plan_mod.plan_cut(2.0, 44100, 256, offset_sec=0.2,
                          consonant_sec=0.0, cutoff_sec=0.5, reverse=True)
    # window is [0.2, 1.5] of the reversed signal -> offset_used = 0.5
    assert c.start_sample == int(0.5 * 44100)
    assert c.end_sample == int(1.8 * 44100)


# ------------------------------------------------------------------- loops

def _materialize(src, plan):
    return np.asarray(plan_mod.apply_frame_plan(jnp.asarray(src), plan,
                                                axis=-1))


@pytest.mark.parametrize("mode", ["concat", "avg", "stretch"])
@pytest.mark.parametrize("tail,desired", [(37, 200), (10, 95), (64, 64),
                                          (100, 60), (7, 22), (3, 100)])
def test_env_loop_plans_match_oracle(mode, tail, desired):
    env_tail = RNG.standard_normal((5, tail)).astype(np.float32)
    want = o.o_loop_env(env_tail, desired, mode)
    plan = plan_mod.plan_env_loop(0, tail, desired, mode)
    got = _materialize(env_tail, plan)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["concat", "avg", "stretch"])
@pytest.mark.parametrize("tail,desired", [(37, 200), (100, 60), (7, 22)])
def test_track_loop_plans_match_oracle(mode, tail, desired):
    track = RNG.standard_normal(tail).astype(np.float32)
    if mode != "stretch" and tail >= desired:
        # reference loops tracks even when tail >= desired (reps=0 + rem)
        pass
    want = o.o_loop_track(track, desired, mode)
    plan = plan_mod.plan_track_loop(0, tail, desired, mode)
    got = _materialize(track, plan)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("tail,desired", [(1000, 5000), (5000, 800),
                                          (777, 2000)])
def test_sample_loop_plan(tail, desired):
    x = RNG.standard_normal(tail).astype(np.float32)
    want = o.o_loop_samples(x, desired)
    plan = plan_mod.plan_sample_loop(0, tail, desired)
    got = _materialize(x, plan)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_loop_with_prefix():
    pre, tail, desired = 13, 20, 55
    env = RNG.standard_normal((4, pre + tail)).astype(np.float32)
    plan = plan_mod.plan_env_loop(pre, tail, desired, "avg")
    got = _materialize(env, plan)
    np.testing.assert_allclose(got[:, :pre], env[:, :pre], atol=1e-6)
    want_tail = o.o_loop_env(env[:, pre:], desired, "avg")
    np.testing.assert_allclose(got[:, pre:], want_tail, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- velocity

@pytest.mark.parametrize("factor", [0.5, 1.3, 2.0])
def test_prefix_stretch_matches_oracle(factor):
    n, pre = 200, 60
    x = RNG.standard_normal(n).astype(np.float32)
    plan = plan_mod.plan_prefix_stretch(n, pre, factor)
    got = _materialize(x, plan)
    want = o.o_stretch_prefix_1d(x.astype(np.float64), pre, factor)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_prefix_stretch_identity_cases():
    assert plan_mod.plan_prefix_stretch(100, 1, 2.0) is None
    assert plan_mod.plan_prefix_stretch(100, 50, 1.0) is None
