"""AOT exported-module store (utils/aot.py): fresh processes skip
Python tracing by deserializing serialized StableHLO instead of
re-tracing the graph (docs/PERFORMANCE.md "warm-process start").

The store is disabled suite-wide (conftest sets GOOFER_TPU_AOT=0
because blobs don't see source edits); these tests opt back in with a
tmp-dir store.
"""
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.export
import jax.numpy as jnp

from goofer_tpu.utils import aot


def test_canon_dtypes():
    args = (np.arange(3, dtype=np.float64), 0.5, 7,
            jnp.ones(2, jnp.float32))
    c = aot._canon(args)
    assert c[0].dtype == np.float32          # x64 -> x32, like jit
    assert c[1].dtype == np.float32
    assert c[2].dtype == np.int32
    assert isinstance(c[3], jax.Array)       # passthrough, never fetched


def test_digest_sensitivity():
    x = np.zeros(8, np.float32)
    base = aot._digest("f", "cfg", (x,))
    assert aot._digest("f", "cfg2", (x,)) != base
    assert aot._digest("g", "cfg", (x,)) != base
    assert aot._digest("f", "cfg", (np.zeros(9, np.float32),)) != base
    assert aot._digest("f", "cfg", (x.astype(np.int32),)) != base
    assert aot._digest("f", "cfg", (x,)) == base


def test_digest_keys_on_source_fingerprint(monkeypatch):
    """Any edit to the goofer_tpu package source must change the digest,
    so a blob can never outlive the code that traced it (ADVICE r4:
    VERSION alone let a traced-graph edit silently serve stale audio)."""
    x = np.zeros(8, np.float32)
    fp = aot._source_fingerprint()
    assert fp and fp == aot._source_fingerprint()   # stable per process
    base = aot._digest("f", "cfg", (x,))
    monkeypatch.setattr(aot, "_src_fp", "0" * 16)   # simulate a source edit
    assert aot._digest("f", "cfg", (x,)) != base


def test_wrap_disabled_returns_jitted_fn(monkeypatch):
    monkeypatch.setenv("GOOFER_TPU_AOT", "0")
    jf = jax.jit(lambda x: x + 1)
    assert aot.wrap("t", "c", jf) is jf


def test_wrap_roundtrip(tmp_path, monkeypatch):
    """First wrapper exports + saves; a second wrapper (standing in for
    a fresh process) loads the blob and must NOT re-export; outputs are
    bitwise-identical and match the plain jit."""
    monkeypatch.setenv("GOOFER_TPU_AOT", str(tmp_path))
    exports = []
    real_export = jax.export.export

    def counting_export(fn, **kw):
        exports.append(1)
        return real_export(fn, **kw)

    monkeypatch.setattr(jax.export, "export", counting_export)

    def f(x, s):
        return jnp.sin(x) * s["g"] + 1.0

    x = np.linspace(0, 1, 64).astype(np.float32)
    s = {"g": 2.0}

    w1 = aot.wrap("t", "cfg", jax.jit(f))
    out1 = np.asarray(w1(x, s))
    assert exports == [1]
    blobs = list(tmp_path.glob("t-*.stablehlo"))
    assert len(blobs) == 1 and blobs[0].stat().st_size > 0

    w2 = aot.wrap("t", "cfg", jax.jit(f))
    out2 = np.asarray(w2(x, s))
    assert exports == [1], "second wrapper must load, not re-export"

    ref = np.asarray(jax.jit(f)(x, s))
    np.testing.assert_array_equal(out1, ref)
    np.testing.assert_array_equal(out2, out1)

    # repeat calls reuse the resolved fn (no extra store traffic)
    np.testing.assert_array_equal(np.asarray(w2(x, s)), out1)


def test_wrap_multiple_signatures(tmp_path, monkeypatch):
    """One wrapper must serve several arg signatures (jit retraces per
    signature; the phrase graphs see several batch shapes through one
    wrapper via bucket chunking) — regression for a first-cut bug that
    bound the wrapper to its first call's shapes."""
    monkeypatch.setenv("GOOFER_TPU_AOT", str(tmp_path))
    w = aot.wrap("t", "cfg", jax.jit(lambda x: x * 3.0))
    a = np.ones(8, np.float32)
    b = np.ones((4, 8), np.float32)
    np.testing.assert_array_equal(np.asarray(w(a)), a * 3.0)
    np.testing.assert_array_equal(np.asarray(w(b)), b * 3.0)
    np.testing.assert_array_equal(np.asarray(w(a)), a * 3.0)
    assert len(list(tmp_path.glob("t-*.stablehlo"))) == 2


def test_wrap_corrupt_blob_reexports(tmp_path, monkeypatch):
    monkeypatch.setenv("GOOFER_TPU_AOT", str(tmp_path))

    def f(x):
        return x * 2.0

    x = np.ones(16, np.float32)
    w1 = aot.wrap("t", "cfg", jax.jit(f))
    np.testing.assert_array_equal(np.asarray(w1(x)), x * 2.0)
    blob = next(tmp_path.glob("t-*.stablehlo"))
    blob.write_bytes(b"not a module")

    w2 = aot.wrap("t", "cfg", jax.jit(f))
    np.testing.assert_array_equal(np.asarray(w2(x)), x * 2.0)
    assert blob.stat().st_size > 16, "corrupt blob should be re-written"


@pytest.fixture(scope="module")
def src_wav():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _make_voicebank_sample

    tmp = tempfile.mkdtemp(prefix="goofer_aot_")
    path = os.path.join(tmp, "a.wav")
    _make_voicebank_sample(path, 44100)
    return path


@pytest.mark.slow
def test_phrase_through_store_matches(src_wav, tmp_path, monkeypatch):
    """End-to-end: render_phrase with the store enabled, drop the
    in-memory graph cache (simulating a fresh process), render again —
    the second pass runs from the deserialized module and must produce
    the identical phrase."""
    import goofer_tpu.sampler.phrase as ph
    from goofer_tpu.sampler.phrase import NoteSpec, render_phrase

    monkeypatch.setenv("GOOFER_TPU_AOT", str(tmp_path))
    notes = [NoteSpec(src_wav, p, length=420, consonant=60, flags="t10")
             for p in ("C4", "E4", "G4")]
    # prime the .goofy feature cache: the first-ever render extracts
    # f32 features and SAVES f16 knots, so a later render that loads
    # them sees a slightly different envelope — that delta is feature
    # quantization, not the store's doing
    render_phrase(notes)

    with ph._cache_lock:
        saved = dict(ph._batched_core_cache)
        ph._batched_core_cache.clear()
    try:
        out1 = [np.asarray(o) for o in render_phrase(notes)]
        assert list(tmp_path.glob("phrase-*.stablehlo"))
        with ph._cache_lock:
            ph._batched_core_cache.clear()
        out2 = [np.asarray(o) for o in render_phrase(notes)]
    finally:
        with ph._cache_lock:
            ph._batched_core_cache.clear()
            ph._batched_core_cache.update(saved)

    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_note_through_store_matches(src_wav, tmp_path, monkeypatch):
    """Single-note path ('note' family): render via the store twice
    across a simulated process boundary; identical output, blob
    written, and the budget sweep's clear drops the wrappers."""
    from pathlib import Path

    from goofer_tpu.io.goofy import formants_to_int_keys
    import goofer_tpu.sampler.render_core as rc
    from goofer_tpu.sampler.resampler import (
        GooferResampler,
        acquire_features,
    )

    monkeypatch.setenv("GOOFER_TPU_AOT", str(tmp_path))
    r = GooferResampler(src_wav, "/dev/null", "C4", 100, "t10", 0,
                        420, 60, 0, 100, 0, "!120", "ABAC#3#AD",
                        autorender=False, seed=0)
    env, f0i, vmask, forms, sr, ylen = acquire_features(
        Path(src_wav), 1024, 256)
    forms = formants_to_int_keys(forms)
    rs, arrays, scalars = r.prepare(env, f0i, vmask, forms, sr, ylen,
                                    bucket=True)

    rc.clear_compiled_render_graphs()
    try:
        out1 = np.asarray(rc.render_note(rs, arrays, scalars, r.key))
        assert list(tmp_path.glob("note-*.stablehlo"))
        rc.clear_compiled_render_graphs()   # "fresh process"
        out2 = np.asarray(rc.render_note(rs, arrays, scalars, r.key))
    finally:
        rc.clear_compiled_render_graphs()

    np.testing.assert_array_equal(out1, out2)
