import numpy as np
import pytest

from goofer_tpu.io.goofy import (
    formants_to_int_keys,
    load_features,
    pad_trim_to_len,
    save_features,
)
from goofer_tpu.editor.core import (
    apply_f0_brush,
    fill_f0_for_painted_voicing,
    paint_mask_span,
    write_back_voicing,
)
from goofer_tpu.sampler.manifest import EXPRESSIONS, manifest_dict, write_manifest
from goofer_tpu.sampler.server import split_arguments

RNG = np.random.default_rng(4)


# ---------------------------------------------------------------- .goofy IO

def _knot_pack(k=48, t=20):
    return {
        "mode": "knots",
        "knot_vals_log": RNG.standard_normal((k, t)).astype(np.float16),
        "hz_knots": np.linspace(0, 22050, k).astype(np.float32),
        "n_bins": 513,
        "n_fft": 1024,
        "sr": 44100,
    }


def test_goofy_roundtrip_knots(tmp_path):
    p = tmp_path / "x_features.goofy"
    f0 = RNG.random(1000).astype(np.float32) * 300
    mask = (f0 > 150).astype(np.float32)
    forms = {"F1": np.full(20, 700.0), 2: np.full(20, 1200.0)}
    pack = _knot_pack()
    save_features(p, pack, f0, mask, forms, 44100, 1000)
    env, f0r, maskr, formsr, sr, ylen = load_features(p)
    assert isinstance(env, dict) and env["mode"] == "knots"
    assert env["n_bins"] == 513 and env["n_fft"] == 1024
    np.testing.assert_allclose(f0r, f0.astype(np.float16).astype(np.float32))
    assert sr == 44100 and ylen == 1000
    assert set(formsr.keys()) == {1, 2, 3, 4}
    np.testing.assert_allclose(formsr[1], forms["F1"])
    # zero-filled missing formants
    assert formsr[3].shape == (1,) and formsr[3][0] == 0


def test_goofy_roundtrip_full_env(tmp_path):
    p = tmp_path / "y_features.goofy"
    env = RNG.random((513, 30)).astype(np.float32)
    f0 = RNG.random(500).astype(np.float32)
    save_features(p, env, f0, f0, {}, 22050, 500)
    env_r, _, _, _, sr, ylen = load_features(p)
    assert env_r.shape == (513, 30)
    np.testing.assert_allclose(
        env_r, env.astype(np.float16).astype(np.float32))


def test_formants_to_int_keys():
    out = formants_to_int_keys({"F1": [700], "f2": [1200], 7: [1], "x": [2]})
    assert set(out.keys()) == {1, 2, 3, 4}
    assert out[1][0] == 700 and out[2][0] == 1200


def test_pad_trim_to_len():
    assert pad_trim_to_len([1, 2], 4).tolist() == [1, 2, 2, 2]
    assert pad_trim_to_len([1, 2, 3], 2).tolist() == [1, 2]
    assert pad_trim_to_len([], 3).tolist() == [0, 0, 0]


# ------------------------------------------------------------------ editor

def test_available_interactive_hook_headless(monkeypatch):
    """No DISPLAY → no hook (the CLI then logs the SE skip instead of
    blocking; ref SillySampler.py:581-611 would open tkinter)."""
    from goofer_tpu.editor import gui

    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    assert gui.available_interactive_hook() is None

    monkeypatch.setenv("DISPLAY", ":0")
    hook = gui.available_interactive_hook()
    try:
        import tkinter  # noqa: F401
        assert hook is gui.interactive_voicing
    except Exception:
        assert hook is None


def test_se1_cli_end_to_end(monkeypatch, tmp_path):
    """SE1 from the REAL CLI surface opens the editor hook mid-render and
    writes the edited voicing back into the .goofy (VERDICT r1 item 4:
    previously a silent no-op because cli.py never passed a hook)."""
    from goofer_tpu import cli
    from goofer_tpu.editor import gui

    from tests.test_resampler import _make_sample

    wav = tmp_path / "src.wav"
    _make_sample(wav)
    out = tmp_path / "out.wav"

    calls = []

    def fake_hook(y_snip, sr, init_mask):
        calls.append((len(y_snip), sr, init_mask.copy()))
        edited = init_mask.copy()
        edited[: len(edited) // 2] = 0.0   # paint the front unvoiced
        return edited

    monkeypatch.setattr(gui, "available_interactive_hook",
                        lambda: fake_hook)
    rc = cli.main([str(wav), str(out), "C4", "100", "SE1", "0", "300",
                   "50", "0", "100", "0", "!120", "AA"])
    assert rc == 0 and out.exists()
    assert len(calls) == 1
    n_snip, sr, init_mask = calls[0]
    assert sr == 44100 and n_snip == len(init_mask) > 0

    # the edit landed in the persisted .goofy (write_back_voicing)
    goofy = wav.with_name(wav.stem + "_features.goofy")
    assert goofy.exists()
    _, _, mask, _, _, _ = load_features(goofy)
    assert np.any(mask == 0.0)


def test_write_back_voicing_forward_and_reversed(tmp_path):
    p = str(tmp_path / "z_features.goofy")
    n = 400
    mask0 = np.ones(n, dtype=np.float32)
    save_features(p, _knot_pack(), np.zeros(n), mask0, {}, 44100, n)

    edited = np.zeros(100, dtype=np.float32)
    write_back_voicing(p, edited, 50, 150, False)
    _, _, m1, _, _, _ = load_features(p)
    assert np.all(m1[50:150] == 0) and np.all(m1[:50] == 1)

    # reversed snippet: span flips to [n-150, n-50)
    save_features(p, _knot_pack(), np.zeros(n), mask0, {}, 44100, n)
    write_back_voicing(p, edited, 50, 150, True)
    _, _, m2, _, _, _ = load_features(p)
    assert np.all(m2[n - 150: n - 50] == 0)
    assert np.all(m2[: n - 150] == 1) and np.all(m2[n - 50:] == 1)


def test_paint_and_brush():
    mask = paint_mask_span(np.zeros(10), 2, 6, True)
    assert mask.tolist() == [0, 0, 1, 1, 1, 1, 0, 0, 0, 0]
    f0 = apply_f0_brush(np.full(10, 200.0), mask, 999.0)  # clamped to 500
    assert np.all(f0[2:6] == 500.0) and np.all(f0[:2] == 0)


def test_fill_f0_for_painted_voicing():
    f0 = np.array([0, 0, 100, 0, 0, 200, 0], dtype=np.float32)
    mask = np.array([1, 1, 1, 1, 1, 1, 1], dtype=np.float32)
    out = fill_f0_for_painted_voicing(f0, mask)
    assert out[0] == 100 and out[3] == pytest.approx(100 + 100 / 3, rel=1e-5)
    # no local F0 at all: nearest global voiced value
    out2 = fill_f0_for_painted_voicing(
        np.zeros(5, np.float32), np.ones(5),
        f0_global=np.array([0, 0, 321.0, 0]), seg_mid=1)
    assert np.all(out2 == 321.0)
    out3 = fill_f0_for_painted_voicing(np.zeros(5, np.float32), np.ones(5))
    assert np.all(out3 == 120.0)


# ---------------------------------------------------------------- manifest

def test_manifest_covers_reference_expressions(tmp_path):
    d = manifest_dict()["expressions"]
    assert len(d) == 31
    # spot-check semantics
    assert d["cent"]["flag"] == "t" and d["cent"]["min"] == -100
    assert d["Hvoi"]["default_value"] == 100
    assert d["vfhz"]["default_value"] == 50
    assert d["sust"]["options"] == ["L0", "L1", "L2"]
    assert d["edit"]["options"] == ["SE0", "SE1"]
    flags = {e.flag for e in EXPRESSIONS if e.flag}
    assert flags >= {"t", "fw", "fst", "fa", "fb", "fc", "fd", "fsta",
                     "fstb", "fstc", "fstd", "V", "U", "sh", "sr", "st",
                     "sg", "vf", "vh", "vl", "sd", "sj", "sa", "su", "br",
                     "es", "pd"}
    out = tmp_path / "m.yaml"
    write_manifest(out)
    import yaml

    loaded = yaml.safe_load(out.read_text())
    assert loaded == manifest_dict()


# ------------------------------------------------------------------ server

def test_split_arguments():
    body = ("C:/voice bank/a.wav C:/cache/out of tune.wav C4 100 g0 "
            "0 1000 0 700 100 0 !120 AA")
    args = split_arguments(body)
    assert args[0].endswith("a.wav")
    assert args[1].endswith("tune.wav")
    assert len(args) == 13
    with pytest.raises(ValueError):
        split_arguments("no wavs here 1 2 3 4 5 6 7 8 9 10 11")


def test_preview_synthesis_buckets_span_lengths():
    """Editor preview reuses one engine graph for nearby span lengths
    (interactive path must not compile per visible-span length)."""
    import time

    import numpy as np

    from goofer_tpu.editor.gui import _preview_synthesis

    sr = 44100

    def feats(n):
        tf = 1 + n // 256
        env = (np.exp(-np.linspace(0, 5, 513))[:, None]
               * np.ones((1, tf)) + 1e-5).astype(np.float32)
        f0 = np.full(n, 220.0, np.float32)
        mask = np.ones(n, np.float32)
        mask[: n // 8] = 0
        return env, f0, mask, {1: np.full(tf, 700.0)}

    t0 = time.perf_counter()
    o1 = _preview_synthesis(*feats(19000), sr)
    t1 = time.perf_counter()
    o2 = _preview_synthesis(*feats(20011), sr)   # same length bucket
    t2 = time.perf_counter()
    assert len(o1) == 19000 and len(o2) == 20011
    assert np.isfinite(o1).all() and np.isfinite(o2).all()
    assert np.abs(o1).max() > 1e-4
    # second distinct span must reuse the compiled bucket graph
    assert (t2 - t1) < (t1 - t0) / 3
