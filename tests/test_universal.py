"""Universal fallback graph (VERDICT r2 item 2): one all-features-on
compiled graph per geometry bucket renders ANY flag combination, with
unused features exactly neutral at their default scalar values.

Parity is asserted universal-vs-specialized on the SAME bucketed
geometry and the same PRNG key, so both sides see identical noise
realizations and identical masking — budgets are float-accumulation
scale, far tighter than the bucketed-vs-exact boundary budget
(test_bucket.py).
"""
import os
import tempfile

import numpy as np
import pytest

from pathlib import Path

from goofer_tpu.io.goofy import formants_to_int_keys
from goofer_tpu.sampler.render_core import (
    render_note,
    universal_static,
    universalize_inputs,
)
from goofer_tpu.sampler.resampler import (
    GooferResampler,
    acquire_features,
    render_note_auto,
    warm_universal,
    _seen_statics,
    _universal_ready,
)

SR = 44100


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    """Drop the jit/lowering caches accumulated by the ~180 tests that
    run before this module.  The all-features-on universal graphs are
    the largest XLA modules in the suite, and compiling them at the
    tail of a long-lived virtual-8-CPU process crashes inside
    XLA:CPU's backend_compile (SIGSEGV, and SIGABRT when the persistent
    cache then serializes the executable) — the same compiles succeed
    in a fresh process, and MALLOC_CHECK_=3 sees no heap corruption
    beforehand, so the trigger is accumulated compiler state, not this
    repo's code.  Clearing JAX's caches releases the retained
    executables/LLVM contexts before the big compiles."""
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
    yield


@pytest.fixture(scope="module")
def src_wav():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _make_voicebank_sample

    tmp = tempfile.mkdtemp(prefix="goofer_universal_")
    path = os.path.join(tmp, "a.wav")
    _make_voicebank_sample(path, SR)
    return path


def _rel(a, b):
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def _prep(src, flags, length=420, velocity=100, seed=0):
    r = GooferResampler(src, "/dev/null", "C4", velocity, flags, 0,
                        length, 60, 0, 100, 0, "!120", "ABAC#3#AD",
                        autorender=False, seed=seed)
    env, f0i, vmask, forms, sr, ylen = acquire_features(Path(src), 1024, 256)
    forms = formants_to_int_keys(forms)
    rs_b, a_b, s_b = r.prepare(env, f0i, vmask, forms, sr, ylen,
                               bucket=True)
    return r, rs_b, a_b, s_b


# every static toggle exercised at least once, plus the decode quirks
CONFIGS = [
    "",                              # nothing on: all-neutral scalars
    "t10B20g-15fw25",                # env fx + warp
    "es-40",                         # negative env shape (smooth branch)
    "es35",                          # positive env shape (sharpen branch)
    "st60",                          # tension > 0
    "st-80",                         # tension < 0 (traced order 4)
    "pd40vf30fa8fb-6",               # dynamics + fry + band warps
    "sh30sr30sg40su40sj20sd30sa40",  # jitters + all layers
    "sh-20sr-10sg-30",               # negative values: toggles OFF but
                                     # decode leaves nonzero strengths
]


@pytest.mark.slow
@pytest.mark.parametrize("flags", CONFIGS)
def test_universal_matches_specialized(src_wav, flags):
    r, rs_b, a_b, s_b = _prep(src_wav, flags)
    ru = universal_static(rs_b)
    assert ru is not None
    a_u, s_u = universalize_inputs(rs_b, a_b, s_b, r.params)

    spec = np.asarray(render_note(rs_b, a_b, s_b, r.key))
    uni = np.asarray(render_note(ru, a_u, s_u, r.key))
    assert uni.shape == spec.shape
    assert np.all(np.isfinite(uni))
    n_true = int(s_b["n_true"])
    assert _rel(uni[:n_true], spec[:n_true]) <= 2e-3, flags


@pytest.mark.slow
def test_universal_velocity(src_wav):
    """Real velocity warp keeps its own positions through the universal
    graph (vel_on was already True)."""
    r, rs_b, a_b, s_b = _prep(src_wav, "t10B20", velocity=150)
    ru = universal_static(rs_b)
    assert ru is not None
    a_u, s_u = universalize_inputs(rs_b, a_b, s_b, r.params)
    spec = np.asarray(render_note(rs_b, a_b, s_b, r.key))
    uni = np.asarray(render_note(ru, a_u, s_u, r.key))
    n_true = int(s_b["n_true"])
    assert _rel(uni[:n_true], spec[:n_true]) <= 2e-3


@pytest.mark.slow
def test_render_note_auto_promotes(src_wav):
    """After warm_universal, a first-sight flag combo renders through the
    warmed graph (promotion) and matches the specialized render; the
    background compile then flips the signature to the direct path."""
    import time

    warm_universal(note_seconds=(0.8,), sr=SR)
    assert len(_universal_ready) >= 1

    flags = "st-40es20su30pd20"
    r, rs_b, a_b, s_b = _prep(src_wav, flags, length=350)
    env, f0i, vmask, forms, sr, ylen = acquire_features(
        Path(src_wav), 1024, 256)
    forms = formants_to_int_keys(forms)
    rs, arrays, scalars = r.prepare(env, f0i, vmask, forms, sr, ylen)
    assert rs not in _seen_statics

    out = np.asarray(render_note_auto(
        r, rs, arrays, scalars,
        lambda: r.prepare(env, f0i, vmask, forms, sr, ylen, bucket=True)))
    assert out.shape == (rs.n,)
    assert np.all(np.isfinite(out))

    # the background thread compiles the specialized graph
    deadline = time.time() + 300
    while rs not in _seen_statics and time.time() < deadline:
        time.sleep(0.5)
    assert rs in _seen_statics

    spec = np.asarray(render_note(rs, arrays, scalars, r.key))
    assert _rel(out, spec) <= 0.06   # bucketed-vs-exact budget
