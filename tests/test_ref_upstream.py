"""Certify the restated oracle against the TRUE upstream reference.

VERDICT r2 item 1: ``tests/oracles.py:o_resample`` is this repo's
*reading* of SillySampler.py:449-1185 — a misreading would replicate
into both sides of every production<->oracle parity assertion.  This
suite closes the chain by executing the actual upstream code in-process
(tests/ref_harness.py stubs numba/soundfile/sounddevice/parselmouth)
against the same .goofy-quantized inputs and the same seven
deterministic flag configs, asserting float-level agreement.

Precision note: real numba promotes float32/int64 to float64, so the
upstream ``pulse_train_numba`` accumulates its phase in f64 — exactly
as the oracle restates it by default.  Under the passthrough stub,
NumPy's weak scalar promotion keeps that accumulator in float32, which
drifts the late-note pulse onsets by whole samples (the pulse-onset-tie
physics of PARITY.md, amplified).  Rather than excluding ever-growing
flip windows, the oracle exposes ``PULSE_PHASE_DTYPE``: this suite
flips it to float32 so BOTH sides accumulate with the stub's numerics
and the waveforms must then agree to float accuracy sample-for-sample —
no exclusions.  Everything the flag does NOT touch (onset logic, pulse
shapes, envelope path, loops, effects chain, mix, trims) is certified
exactly; the f32-vs-f64 phase question itself is covered by the
production<->oracle suite's tie analysis.

Also here: cross-implementation ``.goofy`` round-trips (VERDICT r2
item 6) — upstream ``save_features`` -> this repo's loader, and this
repo's writer -> upstream ``load_features``.
"""
import numpy as np
import pytest

from goofer_tpu.io import goofy as gio
from goofer_tpu.utils.audio_io import write_wav
from goofer_tpu.utils.metrics import lsd_db
from tests import oracles as o
from tests.fixtures_common import (
    DET_CONFIGS,
    HOP,
    N_FFT,
    NOTE_ARGS,
    SR,
    make_synth_features,
)
from tests.ref_harness import load_reference, render_reference, zero_noise

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def upstream():
    return load_reference()


@pytest.fixture(scope="module")
def seeded(upstream, tmp_path_factory):
    """Source wav + .goofy pair, plus the decoded (fp16-storage
    round-tripped) features BOTH the upstream render and the oracle
    consume — identical inputs end to end."""
    tmp = tmp_path_factory.mktemp("ref_upstream")
    env, f0, mask, forms, sr, ylen = make_synth_features()
    src = tmp / "src.wav"
    # content only matters for SE1 (unused); length must equal ylen
    write_wav(src, np.zeros(ylen, dtype=np.float32), sr)
    gio.save_features(tmp / "src_features.goofy", env, f0, mask, forms,
                      sr, ylen)
    features_q = gio.load_features(tmp / "src_features.goofy")
    return tmp, src, features_q


class stub_phase_numerics:
    """Run the oracle's pulse phase accumulator with the stubbed
    upstream's float32 numerics (see module docstring)."""

    def __enter__(self):
        o.PULSE_PHASE_DTYPE = np.float32
        return self

    def __exit__(self, *exc):
        o.PULSE_PHASE_DTYPE = np.float64
        return False


# f0-chain certification tolerance: 5 milli-Hz (~0.03 cents at 300 Hz).
# The oracle restates the f0 chain in float64 while upstream computes it
# in float32 (GOOFER.py:8 DCOMPUTE), so last-ulp op-ordering noise up to
# ~2e-5 Hz is physical; any actual misreading of a formula would miss by
# whole cents.
F0_ATOL_HZ = 5e-3


class inject_upstream_kernel_inputs:
    """Route the oracle's pulse/subharm kernels through the f0 arrays
    captured from the upstream run: assert the oracle's own f0 agrees to
    F0_ATOL_HZ (certifying the restated f0 chain), then evaluate the
    kernel on the upstream array BITWISE so the downstream waveform
    comparison is float-exact — pulse-onset ties can no longer flip on
    f32 op-ordering ulps (see PARITY.md).  Call order and count are part
    of the certification."""

    def __init__(self, cap):
        self.cap = cap
        self.n_pulse = 0
        self.n_sub = 0

    def __enter__(self):
        self._pt = o.o_pulse_train
        self._sh = o.o_subharm_pulses
        inj = self

        def pt(f0, sr, Ra=0.02, Rg=1.7, Rk=0.8):
            assert inj.n_pulse < len(inj.cap.pulse_f0), \
                "oracle made more pulse_train calls than upstream"
            ref = inj.cap.pulse_f0[inj.n_pulse]
            inj.n_pulse += 1
            np.testing.assert_allclose(
                np.asarray(f0, np.float64), np.asarray(ref, np.float64),
                rtol=0, atol=F0_ATOL_HZ,
                err_msg=f"pulse_train call #{inj.n_pulse} f0 chain")
            return inj._pt(ref, sr, Ra, Rg, Rk)

        def sh(f0, sr, mask, semitones, weight):
            assert inj.n_sub < len(inj.cap.subharm_calls), \
                "oracle made more add_subharms calls than upstream"
            ref_f0, ref_kw = inj.cap.subharm_calls[inj.n_sub]
            inj.n_sub += 1
            np.testing.assert_allclose(
                np.asarray(f0, np.float64), np.asarray(ref_f0, np.float64),
                rtol=0, atol=F0_ATOL_HZ,
                err_msg=f"add_subharms call #{inj.n_sub} f0 chain")
            assert semitones == ref_kw.get("subharm_semitones", -12)
            assert weight == pytest.approx(
                ref_kw.get("subharm_weight", 0.5))
            return inj._sh(ref_f0, sr, mask, semitones, weight)

        o.o_pulse_train = pt
        o.o_subharm_pulses = sh
        return self

    def __exit__(self, *exc):
        o.o_pulse_train = self._pt
        o.o_subharm_pulses = self._sh
        if exc[0] is None:
            assert self.n_pulse == len(self.cap.pulse_f0), \
                (self.n_pulse, len(self.cap.pulse_f0))
            assert self.n_sub == len(self.cap.subharm_calls), \
                (self.n_sub, len(self.cap.subharm_calls))
        return False


@pytest.mark.parametrize(
    "cfg_id,pitch,velocity,flags,ps,length_ms",
    [c[:6] for c in DET_CONFIGS], ids=[c[0] for c in DET_CONFIGS])
def test_oracle_matches_upstream(seeded, cfg_id, pitch, velocity, flags,
                                 ps, length_ms):
    tmp, src, features_q = seeded
    from tests.ref_harness import capture_kernel_inputs

    with zero_noise(), capture_kernel_inputs() as cap:
        out_ref = render_reference(
            src, tmp / f"out_{cfg_id}.wav", pitch, velocity, flags,
            NOTE_ARGS["offset"], length_ms, NOTE_ARGS["consonant"],
            NOTE_ARGS["cutoff"], NOTE_ARGS["volume"],
            NOTE_ARGS["modulation"], NOTE_ARGS["tempo"], ps)
    assert cap.pulse_f0, "upstream made no pulse_train calls"

    with stub_phase_numerics(), inject_upstream_kernel_inputs(cap):
        out_ora = o.o_resample(
            features_q, pitch, velocity, flags, NOTE_ARGS["offset"],
            length_ms, NOTE_ARGS["consonant"], NOTE_ARGS["cutoff"],
            NOTE_ARGS["volume"], NOTE_ARGS["modulation"],
            NOTE_ARGS["tempo"], ps, uv_strength=0.0, breath_strength=0.0,
            rng=None)

    assert out_ref.shape == out_ora.shape, (out_ref.shape, out_ora.shape)

    peak = float(np.max(np.abs(out_ref)) + 1e-12)
    np.testing.assert_allclose(out_ref / peak, out_ora / peak, atol=5e-4)
    assert lsd_db(out_ref.astype(np.float32), out_ora.astype(np.float32),
                  SR, N_FFT, HOP) < 0.05


def test_goofy_upstream_writes_repo_reads(upstream, tmp_path):
    """Upstream save_features (GOOFER.py:287-317) -> this repo's loader:
    identical arrays, both storage modes."""
    gf, _, _ = upstream
    env, f0, mask, forms, sr, ylen = make_synth_features()

    p_full = tmp_path / "up_full.goofy"
    gf.save_features(p_full, env, f0, mask, forms, sr, ylen)
    env2, f02, mask2, forms2, sr2, ylen2 = gio.load_features(p_full)
    np.testing.assert_array_equal(env2, env.astype(np.float16)
                                  .astype(np.float32))
    np.testing.assert_array_equal(f02, f0.astype(np.float16)
                                  .astype(np.float32))
    np.testing.assert_array_equal(mask2, mask.astype(np.float16)
                                  .astype(np.float32))
    assert (sr2, ylen2) == (sr, ylen)
    for k in (1, 2, 3, 4):
        np.testing.assert_array_equal(np.asarray(forms2[k]),
                                      np.asarray(forms[k]))

    # knots mode: build the pack with this repo's codec, write upstream
    from goofer_tpu.compat import compress_env_to_knots

    pack = compress_env_to_knots(env, sr, N_FFT)
    p_knots = tmp_path / "up_knots.goofy"
    gf.save_features(p_knots, pack, f0, mask, forms, sr, ylen)
    envk, *_ = gio.load_features(p_knots)
    assert isinstance(envk, dict) and envk["mode"] == "knots"
    np.testing.assert_array_equal(np.asarray(envk["knot_vals_log"]),
                                  np.asarray(pack["knot_vals_log"]))


def test_goofy_repo_writes_upstream_reads(upstream, tmp_path):
    """This repo's writer (io/goofy.py) -> upstream load_features
    (GOOFER.py:319-339): identical decoded features, and upstream
    decode_env_from_knots agrees with this repo's decode."""
    gf, _, _ = upstream
    env, f0, mask, forms, sr, ylen = make_synth_features()

    p = tmp_path / "repo_full.goofy"
    gio.save_features(p, env, f0, mask, forms, sr, ylen)
    env_u, f0_u, mask_u, forms_u, sr_u, ylen_u = gf.load_features(p)
    np.testing.assert_array_equal(
        np.asarray(env_u, np.float32),
        env.astype(np.float16).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(f0_u, np.float32),
        f0.astype(np.float16).astype(np.float32))
    assert (int(sr_u), int(ylen_u)) == (sr, ylen)

    from goofer_tpu.compat import compress_env_to_knots, decode_env_from_knots

    pack = compress_env_to_knots(env, sr, N_FFT)
    pk = tmp_path / "repo_knots.goofy"
    gio.save_features(pk, pack, f0, mask, forms, sr, ylen)
    env_pack_u, *_ = gf.load_features(pk)
    dec_up = np.asarray(gf.decode_env_from_knots(env_pack_u),
                        dtype=np.float32)
    dec_repo = np.asarray(decode_env_from_knots(pack), dtype=np.float32)
    np.testing.assert_allclose(dec_up, dec_repo, rtol=2e-3, atol=1e-6)
