"""Bucketed, batched folder extraction (VERDICT r1 item 4): a voicebank
of ~50 distinct file lengths extracts with <=4 compiled analysis graphs,
results bit-match the per-file exact path, and the folder mode
checkpoints/skips via .goofy files."""
import os
import tempfile
from pathlib import Path

import numpy as np
import pytest

from goofer_tpu import config
from goofer_tpu.analysis import features as F
from goofer_tpu.utils.audio_io import write_wav

pytestmark = pytest.mark.slow

SR = 44100


def _tone(dur: float, f0: float, seed: int = 0) -> np.ndarray:
    n = int(dur * SR)
    t = np.arange(n) / SR
    track = f0 * (1 + 0.01 * np.sin(2 * np.pi * 5 * t))
    ph = np.cumsum(track / SR)
    y = 0.3 * (2 * (ph % 1) - 1)
    rng = np.random.default_rng(seed)
    y[: n // 8] = 0.05 * rng.standard_normal(n // 8)
    return y.astype(np.float32)


def test_fifty_distinct_lengths_four_compiles():
    lengths = [0.30 + 0.0057 * i for i in range(50)]      # 0.30..0.58 s
    ys = [_tone(d, 170 + 3 * i, seed=i) for i, d in enumerate(lengths)]

    F._analysis_graph_bucketed.cache_clear()
    results = F.extract_features_batch(ys, SR)

    # compile count = sum over bucket graphs of their shape variants
    info = F._analysis_graph_bucketed.cache_info()
    compiles = 0
    # re-derive the graphs to introspect their jit caches
    seen = set()
    for y in ys:
        n_pad = config.bucket_len(len(y) + 8 * 256)
        if n_pad in seen:
            continue
        seen.add(n_pad)
        graph, _, _, _ = F._analysis_graph_bucketed(
            n_pad, SR, 1024, 256, 75.0, 2, True,
            n_pad // 256 + 2, n_pad // 256 + 2)
        compiles += graph._cache_size()
    assert info.misses == len(seen)          # one graph per length bucket
    assert compiles <= 4, f"{compiles} compiles for 50 distinct lengths"

    # spot-check exactness vs the per-file path
    for i in (0, 27, 49):
        env_b, f0_b, m_b, forms_b, knots_b = results[i]
        env_e, f0_e, m_e, forms_e, knots_e = F.extract_features(ys[i], SR)
        assert env_b.shape == env_e.shape
        np.testing.assert_allclose(env_b, env_e, rtol=0, atol=1e-6)
        voiced = (f0_e > 75) & (f0_b > 75)
        cents = np.abs(1200 * np.log2((f0_b[voiced] + 1e-9)
                                      / (f0_e[voiced] + 1e-9)))
        assert cents.max() < 0.1
        assert np.mean(m_b != m_e) < 1e-3
        # vmapped Burg/DK reorders reductions: sub-0.05 Hz jitter is noise
        np.testing.assert_allclose(forms_b[1], forms_e[1], atol=0.05)
        assert (knots_b["knot_vals_log"].shape
                == knots_e["knot_vals_log"].shape)


def test_folder_extraction_end_to_end(tmp_path):
    from goofer_tpu.sampler.batch_extract import extract_features_recursive

    paths = []
    for i, dur in enumerate((0.31, 0.37, 0.44)):
        p = tmp_path / f"v{i}.wav"
        write_wav(p, _tone(dur, 200 + 20 * i), SR)
        paths.append(p)
    # a corrupt file must be skipped, not fatal
    bad = tmp_path / "broken.wav"
    bad.write_bytes(b"RIFFnope")

    count = extract_features_recursive(tmp_path)
    assert count == 4
    for p in paths:
        assert (tmp_path / f"{p.stem}_features.goofy").exists()
    assert not (tmp_path / "broken_features.goofy").exists()

    # second run: everything cached, nothing re-extracted
    from goofer_tpu.io.goofy import load_features

    before = [(tmp_path / f"{p.stem}_features.goofy").stat().st_mtime_ns
              for p in paths]
    extract_features_recursive(tmp_path)
    after = [(tmp_path / f"{p.stem}_features.goofy").stat().st_mtime_ns
             for p in paths]
    assert before == after

    env, f0i, vmask, forms, sr, ylen = load_features(
        tmp_path / "v0_features.goofy")
    assert sr == SR and ylen == int(0.31 * SR)


def _ulp_equal_f32(a, b, maxulp=2):
    a32 = np.asarray(a, dtype=np.float32)
    b32 = np.asarray(b, dtype=np.float32)
    try:
        np.testing.assert_array_max_ulp(a32, b32, maxulp=maxulp)
        return True
    except AssertionError:
        return False


def _f0_storage_equal(f0_d, f0_l, max_flips=4):
    """f0 parity at the .goofy STORAGE precision: the lean path ships
    frame-rate f0 and interpolates per-sample on the host (VERDICT r3
    item 6 — the per-sample f32 vector was most of the fetch bytes);
    host np vs device XLA lerp differ by last-bit f32 rounding, which
    the f16 storage cast absorbs except for values sitting exactly on a
    rounding boundary (allow a few single-ulp flips)."""
    a = np.asarray(f0_d, dtype=np.float16)
    b = np.asarray(f0_l, dtype=np.float16)
    diff = a != b
    if np.sum(diff) > max_flips:
        return False
    if np.any(diff):
        ulp = np.spacing(np.maximum(np.abs(a[diff]), np.abs(b[diff])))
        if np.any(np.abs(a[diff].astype(np.float32)
                         - b[diff].astype(np.float32)) > ulp + 1e-12):
            return False
    return True


def test_lean_extraction_identical():
    """dense=False (device-side knot pick + f16 bitcast-packed fetch,
    VERDICT r2 item 4; frame-rate f0 + host interp, VERDICT r3 item 6)
    yields the dense path's .goofy payload: knots, mask and formants
    exactly; f0 identical at the f16 storage precision."""
    y = _tone(0.47, 210, seed=3)
    env_d, f0_d, m_d, forms_d, kn_d = F.extract_features(y, SR)
    env_l, f0_l, m_l, forms_l, kn_l = F.extract_features(y, SR,
                                                         dense=False)
    assert env_l is None
    assert _f0_storage_equal(f0_d, f0_l)
    # mask is thresholded f0 > f0_min: a last-bit wobble can only flip
    # a sample sitting exactly on the 75 Hz threshold
    assert np.sum(m_d != m_l) <= 2
    assert np.abs(kn_d["knot_vals_log"].astype(np.float32)
                  - kn_l["knot_vals_log"].astype(np.float32)).max() \
        <= 2e-3  # 1 f16 ulp at the stored magnitudes
    assert np.array_equal(kn_d["hz_knots"], kn_l["hz_knots"])
    assert (kn_d["n_bins"], kn_d["n_fft"], kn_d["sr"]) \
        == (kn_l["n_bins"], kn_l["n_fft"], kn_l["sr"])
    for k in forms_d:
        assert _ulp_equal_f32(forms_d[k], forms_l[k])


def test_lean_batch_matches_dense_batch():
    ys = [_tone(0.31 + 0.04 * i, 150 + 40 * i, seed=i) for i in range(5)]
    rb_d = F.extract_features_batch(ys, SR)
    rb_l = F.extract_features_batch(ys, SR, dense=False)
    for d, l in zip(rb_d, rb_l):
        assert l[0] is None
        assert _f0_storage_equal(d[1], l[1])
        assert np.sum(d[2] != l[2]) <= 2
        assert np.abs(d[4]["knot_vals_log"].astype(np.float32)
                      - l[4]["knot_vals_log"].astype(np.float32)).max() \
            <= 2e-3
        for k in d[3]:
            assert _ulp_equal_f32(d[3][k], l[3][k])


def test_extraction_non_standard_sample_rates():
    """Every analysis graph is parameterized by sr (frame grids, knot
    frequencies, f0 search bounds scale with it); 22.05k and 48k inputs
    must track the same tone the 44.1k path does."""
    import numpy as np

    from goofer_tpu.analysis.features import extract_features_batch

    for sr in (22050, 48000):
        n = int(0.4 * sr)
        t = np.arange(n) / sr
        y = (0.4 * np.sin(2 * np.pi * 220.0 * t)
             + 0.1 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        (res,) = extract_features_batch([y], sr, dense=False)
        _env, f0, mask, forms, knots = res
        voiced = f0[np.asarray(mask) > 0]
        assert len(voiced) > n // 2, sr
        assert abs(float(np.median(voiced)) - 220.0) < 10.0, sr
        assert knots["sr"] == sr
