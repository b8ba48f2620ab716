"""Batched + sharded rendering on the virtual 8-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from goofer_tpu.engine.synth import SynthStatic, synthesize
from goofer_tpu.parallel import (
    make_mesh,
    pad_note_batch,
    render_batch,
    render_batch_sharded,
)
from goofer_tpu.ops.envelope import compress_env_to_knots

SR = 44100
N_FFT = 512
HOP = 128
N_BINS = N_FFT // 2 + 1
RNG = np.random.default_rng(2)


def _note(n, f0_hz):
    t_frames = 1 + n // HOP
    env = (np.exp(-np.linspace(0, 5, N_BINS))[:, None]
           * (1 + 0.2 * np.sin(np.linspace(0, 9, t_frames)))[None, :]
           + 1e-5).astype(np.float32)
    f0 = np.full(n, f0_hz, dtype=np.float32)
    f0[: n // 10] = 0
    mask = (f0 > 75).astype(np.float32)
    tracks = np.zeros((4, t_frames), dtype=np.float32)
    return env, f0, mask, tracks


@pytest.mark.slow
def test_vmap_batch_matches_single():
    n = 6000
    notes = [_note(n, f) for f in (180.0, 220.0, 300.0)]
    batch = pad_note_batch([x[0] for x in notes], [x[1] for x in notes],
                           [x[2] for x in notes], [x[3] for x in notes])
    st = SynthStatic(sr=SR, n_fft=N_FFT, hop=HOP, n=n)
    mix_b, harm_b, uv_b, bre_b = render_batch(st, batch,
                                              key=jax.random.PRNGKey(3))
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    for i, (env, f0, mask, tracks) in enumerate(notes):
        _, harm_i, _, _ = synthesize(
            st, env, f0, mask, tracks,
            knobs={"uv_strength": 0.0, "breath_strength": 0.0},
            key=keys[i])
        # harmonic path is deterministic given f0 -> compare up to the
        # normalization difference (batch peak-norm sees noise stems)
        hb = np.asarray(harm_b[i])
        hi = np.asarray(harm_i)
        num = float(np.dot(hb, hi))
        den = float(np.linalg.norm(hb) * np.linalg.norm(hi) + 1e-12)
        assert num / den > 0.99, (i, num / den)


@pytest.mark.slow
def test_sharded_render_runs_on_mesh():
    mesh = make_mesh(8, tp=2)
    assert mesh.devices.shape == (4, 2)
    n = 4096
    b = 4
    notes = [_note(n, 150.0 + 40 * i) for i in range(b)]
    # knot-compress each envelope with a fixed K so shapes agree
    knots = []
    for env, _, _, _ in notes:
        pack = compress_env_to_knots(env, SR, N_FFT)
        knots.append(pack)
    k = max(p["knot_vals_log"].shape[0] for p in knots)
    # re-encode at shared K by padding via re-compression (use K_max path)
    from goofer_tpu.ops.envelope import _knot_bin_idx
    import numpy as _np

    shared = []
    for (env, _, _, _m), p in zip(notes, knots):
        bin_idx = _knot_bin_idx(SR, N_FFT, 128, N_BINS)
        log_env = _np.log(_np.maximum(env, 1e-8))
        shared.append(log_env[bin_idx, :])
    knots_b = jnp.asarray(_np.stack(shared), dtype=jnp.float32)
    f0_b = jnp.asarray(_np.stack([x[1] for x in notes]))
    mask_b = jnp.asarray(_np.stack([x[2] for x in notes]))
    tr_b = jnp.asarray(_np.stack([x[3] for x in notes]))

    st = SynthStatic(sr=SR, n_fft=N_FFT, hop=HOP, n=n)
    mix, harm, uv, bre = render_batch_sharded(
        mesh, st, knots_b, f0_b, mask_b, tr_b)
    assert mix.shape == (b, n)
    arr = np.asarray(mix)
    assert np.all(np.isfinite(arr))
    assert np.max(np.abs(arr)) > 0


@pytest.mark.slow
def test_sharded_render_pads_off_size_knot_axis():
    """A .goofy with a knot count not divisible by the tp mesh axis must
    still render: the knot contraction axis zero-pads to a tp multiple
    (zero w column x zero knot row adds +0 in log space — exact), and an
    off-size note batch raises a clear error instead of shard_map's
    opaque shape failure (ADVICE r4)."""
    from goofer_tpu.ops.envelope import _knot_bin_idx

    mesh = make_mesh(8, tp=2)
    n = 4096
    b = 4
    notes = [_note(n, 150.0 + 40 * i) for i in range(b)]
    bin_idx = _knot_bin_idx(SR, N_FFT, 128, N_BINS)
    shared = [np.log(np.maximum(env, 1e-8))[bin_idx, :]
              for env, _, _, _ in notes]
    # K=127: odd, not divisible by tp=2
    knots_b = jnp.asarray(np.stack(shared), dtype=jnp.float32)[:, :127]
    f0_b = jnp.asarray(np.stack([x[1] for x in notes]))
    mask_b = jnp.asarray(np.stack([x[2] for x in notes]))
    tr_b = jnp.asarray(np.stack([x[3] for x in notes]))

    st = SynthStatic(sr=SR, n_fft=N_FFT, hop=HOP, n=n)
    mix, _, _, _ = render_batch_sharded(
        mesh, st, knots_b, f0_b, mask_b, tr_b)
    arr = np.asarray(mix)
    assert arr.shape == (b, n) and np.all(np.isfinite(arr))
    assert np.max(np.abs(arr)) > 0

    with pytest.raises(ValueError, match="not divisible by the dp"):
        render_batch_sharded(mesh, st, knots_b[:3], f0_b[:3],
                             mask_b[:3], tr_b[:3])


@pytest.mark.slow
def test_full_render_sharded_matches_single():
    """The FULL fused note render sharded over the mesh equals the
    single-device vmapped dispatch (note renders are independent — no
    collectives required, SURVEY §2.6)."""
    import numpy as np

    from goofer_tpu.parallel import make_mesh, render_notes_sharded
    from goofer_tpu.sampler.phrase import ARRAY_ORDER, _batched_core
    from goofer_tpu.sampler.resampler import GooferResampler

    sr, n_fft, hop = 44100, 256, 64
    ylen = 4096
    n_bins = n_fft // 2 + 1
    t = ylen // hop + 1
    env = (np.exp(-np.linspace(0, 5, n_bins))[:, None]
           * np.ones((1, t)) + 1e-5).astype(np.float32)
    f0i = np.full(ylen, 220.0)
    f0i[: ylen // 8] = 0.0
    vmask = (f0i > 75).astype(np.float64)
    forms = {i: np.full(t, 500.0 * i) for i in (1, 2, 3, 4)}

    r = GooferResampler("dry.wav", "/dev/null", "C4", 100, "t10B20",
                        0, 60, 20, 0, 100, 0, "!120", "AA",
                        n_fft=n_fft, hop=hop, autorender=False)
    rs, arrays, scalars = r.prepare(env, f0i, vmask, forms, sr, ylen,
                                    bucket=True)

    b = 8
    axes = tuple(0 for _ in ARRAY_ORDER)
    stacked = [np.stack([np.asarray(arrays[k])] * b) for k in ARRAY_ORDER]
    sc = {k: np.stack([np.asarray(v, dtype=np.float32)] * b)
          for k, v in scalars.items()}
    keys = np.stack([np.zeros(b, np.uint32),
                     np.arange(b, dtype=np.uint32)], axis=1)

    mesh = make_mesh(8, tp=2)
    out_sharded = np.asarray(render_notes_sharded(
        mesh, rs, axes, stacked, sc, keys))

    fn = _batched_core(rs, axes)
    out_single = np.asarray(fn(*[np.asarray(s) for s in stacked], sc, keys))

    assert out_sharded.shape == (b, rs.n)
    np.testing.assert_allclose(out_sharded, out_single, rtol=2e-5,
                               atol=2e-5)


@pytest.mark.slow
def test_render_phrase_on_mesh_matches_single():
    """render_phrase(mesh=...) distributes each group's batch over the
    mesh and returns the same audio as the single-device path."""
    import os
    import sys
    import tempfile

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _make_voicebank_sample
    from goofer_tpu.parallel import make_mesh
    from goofer_tpu.sampler.phrase import NoteSpec, render_phrase

    sr = 44100
    tmp = tempfile.mkdtemp(prefix="goofer_mesh_phrase_")
    src = os.path.join(tmp, "a.wav")
    _make_voicebank_sample(src, sr)

    notes = [NoteSpec(src, p, length=ln, consonant=60, flags="t10B10")
             for p, ln in (("C4", 420), ("D4", 420), ("E4", 420),
                           ("G4", 420), ("A4", 530), ("C5", 530))]
    render_phrase(notes[:1])      # extract + persist the .goofy first:
    # the initial call renders from the freshly-extracted DENSE envelope
    # while later calls use the knot-compressed cache (reference
    # extract-once semantics), so compare cache-warm vs cache-warm
    single = render_phrase(notes)
    mesh = make_mesh(8, tp=2)
    sharded = render_phrase(notes, mesh=mesh)
    assert len(sharded) == len(single)
    for a, b in zip(sharded, single):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_extraction_sharded_matches_single():
    """extract_features_batch(mesh=...) shards the file batch over every
    mesh axis (pure data parallelism — per-file analysis is independent)
    and returns the same features as the single-device path."""
    import numpy as np

    from goofer_tpu.analysis.features import extract_features_batch
    from goofer_tpu.parallel import make_mesh

    sr = 44100
    rng = np.random.default_rng(3)
    ys = []
    for i, (f0, dur) in enumerate(
            [(200, 0.35), (240, 0.35), (280, 0.52), (180, 0.52), (320, 0.35)]):
        n = int(dur * sr)
        t = np.arange(n) / sr
        y = (0.4 * np.sin(2 * np.pi * f0 * t)
             + 0.12 * np.sin(2 * np.pi * 2 * f0 * t)
             + 0.01 * rng.standard_normal(n))
        ys.append(y.astype(np.float32))

    single = extract_features_batch(ys, sr, dense=False)
    mesh = make_mesh(8, tp=2)
    sharded = extract_features_batch(ys, sr, dense=False, mesh=mesh)
    assert len(sharded) == len(single) == len(ys)
    for (e_s, f0_s, m_s, forms_s, k_s), (e_r, f0_r, m_r, forms_r, k_r) in zip(
            sharded, single):
        assert e_s is None and e_r is None
        np.testing.assert_allclose(f0_s, f0_r, rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(m_s, m_r)
        for k in forms_r:
            np.testing.assert_allclose(forms_s[k], forms_r[k],
                                       rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(
            k_s["knot_vals_log"].astype(np.float32),
            k_r["knot_vals_log"].astype(np.float32), atol=2e-2)
        assert k_s["knot_vals_log"].shape == k_r["knot_vals_log"].shape


@pytest.mark.slow
def test_sharded_graphs_compile_with_no_collectives():
    """The data-parallel graphs must stay collective-free under the mesh.

    Regression lock for a real partitioning bug: GSPMD-from-input-
    shardings cannot partition the fft custom-call's batch dimension, so
    it silently all-gathered the note batch and every device computed
    EVERY note's FFTs (12 all-gathers; dp=8 at 0.44-0.60x the dp=1
    throughput).  The shard_map formulation runs per-shard programs
    locally; its compiled HLO must contain FFTs but no cross-device
    collectives."""
    from goofer_tpu.analysis.features import _analysis_graph_bucketed

    mesh = make_mesh(8, tp=2)
    n_pad, hop = 8192, 256
    pf_pad = ff_pad = n_pad // hop + 2
    graph, _, _, _ = _analysis_graph_bucketed(
        n_pad, SR, 1024, hop, 75.0, 2, True, pf_pad, ff_pad,
        lean=True, mesh=mesh)
    lowered = graph.lower(
        jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((8,), jnp.float32),
        jax.ShapeDtypeStruct((8, pf_pad), jnp.int32),
        jax.ShapeDtypeStruct((8,), jnp.int32),
        jax.ShapeDtypeStruct((8, ff_pad), jnp.int32),
        jax.ShapeDtypeStruct((8,), jnp.int32),
    )
    txt = lowered.compile().as_text()
    assert "fft" in txt
    for op in ("all-gather", "all-reduce", "collective-permute",
               "all-to-all", "reduce-scatter"):
        assert op not in txt, f"unexpected {op} in sharded analysis HLO"
