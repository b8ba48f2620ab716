"""Phrase renderer: grouped vmapped dispatch over full note renders."""
import numpy as np
import pytest

from goofer_tpu.sampler.phrase import NoteSpec, plan_phrase, render_phrase
from tests.test_resampler import SR, _dominant_period, _make_sample


@pytest.fixture(scope="module")
def vb(tmp_path_factory):
    d = tmp_path_factory.mktemp("phrase_vb")
    _make_sample(d / "a.wav")
    return d


def test_phrase_groups_equal_shapes(vb):
    notes = [
        NoteSpec(str(vb / "a.wav"), "C4", length=300),
        NoteSpec(str(vb / "a.wav"), "E4", length=300),
        NoteSpec(str(vb / "a.wav"), "G4", length=300),
        NoteSpec(str(vb / "a.wav"), "C5", length=500),
    ]
    planned, _ = plan_phrase(notes)
    keys = {(pl.rs, tuple(np.asarray(pl.arrays["f0_cut"]).shape
                          for _ in [0])) for pl in planned}
    # first three notes share a RenderStatic; the fourth differs by length
    lengths = {pl.rs.n for pl in planned}
    assert len(lengths) == 2


def test_phrase_renders_correct_pitches(vb):
    notes = [
        NoteSpec(str(vb / "a.wav"), "C4", length=300),
        NoteSpec(str(vb / "a.wav"), "E4", length=300),
        NoteSpec(str(vb / "a.wav"), "G4", length=300),
    ]
    outs = render_phrase(notes)
    assert len(outs) == 3
    want = [261.63, 329.63, 392.0]
    for y, f_want in zip(outs, want):
        assert np.all(np.isfinite(y))
        seg = y[len(y) // 3: 2 * len(y) // 3]
        f_est = SR / _dominant_period(seg, SR)
        assert abs(f_est - f_want) / f_want < 0.03, (f_est, f_want)


def test_phrase_mixed_flags_still_batch(vb):
    # same flags-actives (none) but different scalar values -> one graph
    notes = [
        NoteSpec(str(vb / "a.wav"), "C4", length=300, flags="t50", volume=80),
        NoteSpec(str(vb / "a.wav"), "D4", length=300, flags="t-50",
                 volume=120),
    ]
    planned, _ = plan_phrase(notes)
    assert planned[0].rs == planned[1].rs
    outs = render_phrase(notes)
    f1 = SR / _dominant_period(outs[0][len(outs[0]) // 2:], SR)
    f2 = SR / _dominant_period(outs[1][len(outs[1]) // 2:], SR)
    assert abs(f1 - 261.63 * 2 ** (0.5 / 12)) / f1 < 0.03
    assert abs(f2 - 293.66 * 2 ** (-0.5 / 12)) / f2 < 0.03


def test_octave_span_shares_graphs(vb):
    """Notes spanning octaves derive different pulse-spacing statics; the
    phrase renderer must harmonize them into ONE group per geometry
    instead of splitting compiled graphs."""
    from goofer_tpu.sampler.phrase import group_planned

    notes = [NoteSpec(str(vb / "a.wav"), p, length=300)
             for p in ("A3", "C4", "A4", "C5")]
    planned, _ = plan_phrase(notes)
    assert len({pl.rs.min_spacing for pl in planned}) > 1  # they differ
    groups = group_planned(planned)
    assert len(groups) == 1
    (rs, _sk), members = next(iter(groups.items()))
    assert len(members) == 4
    # harmonized to the most conservative member
    assert rs.min_spacing == min(pl.rs.min_spacing for pl in planned)


def test_octave_span_with_fry_shares_graphs(vb):
    """With fry on, the f0 range (and so max_overlap) diverges between
    high and low notes; grouping must harmonize the overlap bounds to the
    group max instead of splitting graphs (the round-4 bench phrase paid
    TWO ~300 MB-generated-code executables over exactly this split)."""
    from goofer_tpu.sampler.phrase import group_planned

    flags = "sh30sr30sg40su40sj20st-30vf40es30pd40fw20fsta50"
    notes = [NoteSpec(str(vb / "a.wav"), p, length=300, flags=flags)
             for p in ("G3", "A3", "C5", "B4")]
    planned, _ = plan_phrase(notes)
    assert len({pl.rs.max_overlap for pl in planned}) > 1  # they differ
    groups = group_planned(planned)
    assert len(groups) == 1
    (rs, _sk), members = next(iter(groups.items()))
    assert len(members) == 4
    assert rs.max_overlap == max(pl.rs.max_overlap for pl in planned)
    assert rs.growl_max_overlap == max(pl.rs.growl_max_overlap
                                       for pl in planned)


def test_plan_memo_reuses_across_calls(vb):
    """Replanning identical notes must return the SAME array objects
    (cross-call memo) and identical plans; a different flag misses."""
    from goofer_tpu.sampler import phrase as P

    notes = [NoteSpec(str(vb / "a.wav"), "C4", length=300, flags="t10")]
    plan_phrase(notes)      # first plan may extract (exact env); later
    p1, _ = plan_phrase(notes)   # plans load the knot-decoded .goofy
    p2, _ = plan_phrase(notes)
    assert p1[0].rs == p2[0].rs
    for k in P.ARRAY_ORDER:
        assert p1[0].arrays[k] is p2[0].arrays[k]
    p3, _ = plan_phrase([NoteSpec(str(vb / "a.wav"), "C4", length=300,
                                  flags="t20")])
    assert not np.array_equal(np.asarray(p3[0].arrays["pitch_ticks"]),
                              np.asarray(p1[0].arrays["pitch_ticks"]))
