"""Bucketed note geometry: arbitrary note lengths share a handful of
compiled render graphs (VERDICT r1 item 3 / SURVEY §7 hard part 3).

Parity budget: the render's noise branch is unseeded-random by reference
design (breath/unvoiced phases), so bucketed-vs-exact is asserted against
the exact path's own seed-to-seed noise floor, plus a smoothed-LSD bound
on the spectral envelope (which averages the phase randomness out).
"""
import os
import tempfile

import numpy as np
import pytest

from pathlib import Path

from goofer_tpu import config
from goofer_tpu.io.goofy import formants_to_int_keys
from goofer_tpu.sampler.phrase import (
    NoteSpec,
    _batched_core_cache,
    render_phrase,
)
from goofer_tpu.sampler.resampler import GooferResampler, acquire_features
from goofer_tpu.utils.metrics import lsd_db

SR = 44100


@pytest.fixture(scope="module")
def src_wav():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _make_voicebank_sample

    tmp = tempfile.mkdtemp(prefix="goofer_bucket_")
    path = os.path.join(tmp, "a.wav")
    _make_voicebank_sample(path, SR)
    return path


def _exact(src, L, seed, flags="B20t10"):
    r = GooferResampler(src, "/dev/null", "C4", 100, flags, 0, L, 60,
                        0, 100, 0, "!120", "AA", autorender=False,
                        seed=seed)
    env, f0i, vmask, forms, sr, ylen = acquire_features(Path(src), 1024, 256)
    return np.asarray(r.resample(env, f0i, vmask,
                                 formants_to_int_keys(forms), sr, ylen))


def _rel(a, b):
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def test_bucket_series():
    assert config.bucket_len(1) == 4096
    assert config.bucket_len(4096) == 4096
    assert config.bucket_len(4097) > 4096
    prev = 0
    for n in range(1000, 300000, 7777):
        b = config.bucket_len(n)
        assert b >= n
        assert b >= prev or b >= n  # monotone on the series
        assert b <= int(n * 1.55) + 4096  # bounded waste
        assert config.bucket_frames(b, 256) >= -(-n // 256) + 1
    assert config.bucket_batch(1) == 1
    assert config.bucket_batch(50) == 64
    assert config.bucket_batch(64) == 64


@pytest.mark.slow
def test_bucketed_matches_exact(src_wav):
    """Same seed, bucketed vs unpadded graph: identical up to window-tail
    boundary effects in the last ~n_fft samples (frame-keyed noise phases
    make even the random branch reproduce)."""
    lengths = [310, 455, 610]
    # one note per phrase so the phrase key (seed, index=0) matches the
    # exact path's PRNGKey(0) and even the noise branch reproduces
    outs = [render_phrase([NoteSpec(src_wav, "C4", length=L, consonant=60,
                                    flags="B20t10")], bucket=True)[0]
            for L in lengths]

    for L, o in zip(lengths, outs):
        exact = _exact(src_wav, L, 0)
        assert len(o) == len(exact)          # true output length preserved
        assert np.all(np.isfinite(o))
        assert _rel(np.asarray(o), exact) <= 0.06
        assert lsd_db(np.asarray(o), exact, SR) <= 0.75


@pytest.mark.slow
def test_twenty_distinct_lengths_three_graphs(src_wav):
    """20 notes with 20 distinct lengths must reuse <= 3 compiled render
    graphs (VERDICT r1 'done' criterion)."""
    lengths = [300 + 29 * i for i in range(20)]     # 300..851 ms, all unique
    notes = [NoteSpec(src_wav, "C4", length=L, consonant=60)
             for L in lengths]
    before = len(_batched_core_cache)
    outs = render_phrase(notes, bucket=True)
    compiles = len(_batched_core_cache) - before
    assert compiles <= 3, f"{compiles} render graphs for 20 lengths"
    for L, o in zip(lengths, outs):
        n_expect = int(L / 1000 * SR) + int(0.06 * SR)
        assert abs(len(o) - n_expect) <= 1
        assert np.all(np.isfinite(np.asarray(o)))
        assert np.abs(np.asarray(o)).max() > 1e-3


@pytest.mark.slow
def test_bucketed_velocity_and_flags(src_wav):
    """Velocity warp + post-fx flags run through the bucketed path."""
    notes = [
        NoteSpec(src_wav, "C4", velocity=140, length=430, consonant=60,
                 flags="g-10fa5"),
        NoteSpec(src_wav, "D4", velocity=60, length=515, consonant=60,
                 flags="st-20"),
        NoteSpec(src_wav, "E4", length=380, consonant=60,
                 flags="pd30vf30"),
    ]
    outs = render_phrase(notes, bucket=True)
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))
        assert np.abs(np.asarray(o)).max() > 1e-3
