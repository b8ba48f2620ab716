"""Editor GUI event-loop coverage (VERDICT r2 weak item 6).

The tkinter editor (goofer_tpu/editor/gui.py) previously had zero
display-driven coverage: all stateful semantics live in editor/core.py,
but the 435 LoC of event wiring — canvas paint handlers, mode keys,
zoom/scroll view math, the F0-brush slider, Apply/Cancel lifecycle, the
modal ``interactive_voicing`` contract and the ``edit_goofy_files``
write-back loop — were untested.  These tests inject tests/fake_tk (a
recording tkinter substitute) and fire the *bound* handlers exactly as
Tk would (ref: SillyEditor.py:339-352 paint, :149-164 brush, :492-502
modal contract, :566-637 batch editor).
"""
import sys

import numpy as np
import pytest

from tests import fake_tk

SR = 44100


@pytest.fixture
def tkpatch(monkeypatch):
    fake_tk.reset()
    monkeypatch.setitem(sys.modules, "tkinter", fake_tk)
    monkeypatch.setitem(sys.modules, "tkinter.ttk", fake_tk.ttk)
    return fake_tk


def _mk_ui(n=8000, init_mask=None, features=None):
    from goofer_tpu.editor.gui import VoicingEditorUI

    root = fake_tk.Tk()
    y = np.sin(np.linspace(0, 80 * np.pi, n)).astype(np.float32) * 0.4
    ui = VoicingEditorUI(root, y, SR, init_mask=init_mask,
                         features=features)
    return root, ui


def _paint(ui, x0, x1, button=3):
    """Drag-paint on the canvas via the real bound handlers."""
    ui.canvas.fire(f"<Button-{button}>", x=x0)
    ui.canvas.fire(f"<B{button}-Motion>", x=x1)
    ui.canvas.fire(f"<ButtonRelease-{button}>")


def test_canvas_paint_lmb_rmb_and_mode_keys(tkpatch):
    """LMB paints voiced, RMB unvoiced; mode keys 2/3 pin the polarity
    regardless of button (ref: SillyEditor.py:330-352)."""
    _, ui = _mk_ui(n=8000)
    w = ui.canvas.winfo_width()  # 800 -> 10 samples per pixel

    _paint(ui, 200, 400, button=3)            # RMB: unvoiced
    a, b = int(200 / w * 8000), int(400 / w * 8000) + 1
    assert (ui.mask[a:b] == 0.0).all()
    assert (ui.mask[:a] == 1.0).all() and (ui.mask[b:] == 1.0).all()

    _paint(ui, 250, 300, button=1)            # LMB: voiced again
    a2, b2 = int(250 / w * 8000), int(300 / w * 8000) + 1
    assert (ui.mask[a2:b2] == 1.0).all()

    ui.win.bindings["2"](fake_tk.Event())     # mode "voiced"
    assert ui.edit_mode == "voiced"
    _paint(ui, 200, 400, button=3)            # RMB now paints VOICED
    assert (ui.mask[a:b] == 1.0).all()

    ui.win.bindings["3"](fake_tk.Event())     # mode "unvoiced"
    _paint(ui, 600, 700, button=1)            # LMB now paints UNVOICED
    c, d = int(600 / w * 8000), int(700 / w * 8000) + 1
    assert (ui.mask[c:d] == 0.0).all()

    # drag leftwards works too (paint span is min..max of anchor/current)
    ui.win.bindings["1"](fake_tk.Event())
    _paint(ui, 100, 50, button=3)
    e, f = int(50 / w * 8000), int(100 / w * 8000) + 1
    assert (ui.mask[e:f] == 0.0).all()


def test_mode_combobox_and_middle_button(tkpatch):
    """The "Editing:" combobox switches modes like the reference's
    (ref: SillyEditor.py:96-103) and MMB paints: unvoiced in "both"
    mode, the pinned polarity otherwise (ref: SillyEditor.py:459-490).
    Keys 1/2/3 keep the combobox display in sync."""
    _, ui = _mk_ui(n=8000)
    w = ui.canvas.winfo_width()

    # MMB in default "both" mode paints unvoiced, like RMB
    _paint(ui, 200, 400, button=2)
    a, b = int(200 / w * 8000), int(400 / w * 8000) + 1
    assert (ui.mask[a:b] == 0.0).all()
    assert (ui.mask[:a] == 1.0).all() and (ui.mask[b:] == 1.0).all()

    # combobox -> "voiced": every button (incl. MMB) paints voiced
    ui.mode_combo.select("voiced")
    assert ui.edit_mode == "voiced"
    _paint(ui, 200, 400, button=2)
    assert (ui.mask[a:b] == 1.0).all()

    # combobox -> "unvoiced": LMB paints unvoiced
    ui.mode_combo.select("unvoiced")
    assert ui.edit_mode == "unvoiced"
    _paint(ui, 600, 700, button=1)
    c, d = int(600 / w * 8000), int(700 / w * 8000) + 1
    assert (ui.mask[c:d] == 0.0).all()

    # key shortcut keeps the combobox variable in sync
    ui.win.bindings["1"](fake_tk.Event())
    assert ui.edit_mode == "both" and ui.mode_var.get() == "both"

    # focus never leaves a stuck selection (reference parity wiring)
    assert ui.mode_combo.kw.get("takefocus") is False
    ui.mode_combo.fire("<FocusIn>", widget=ui.mode_combo)


def test_zoom_scroll_view_and_redraw(tkpatch):
    """Zoom slider + scrollbar drive _view_span; every interaction
    redraws the canvas (background runs, waveform, HUD text)."""
    _, ui = _mk_ui(n=8000)

    ui.zoom_slider.kw["command"]("4")         # Tk passes strings
    assert ui._view_span() == (0, 2000)

    ui.scrollbar.kw["command"]("moveto", "0.5")
    assert ui._view_span() == (3000, 5000)
    lo, hi = ui.scrollbar.set_calls[-1]
    assert lo == pytest.approx(0.5) and hi == pytest.approx(0.75)

    ui.scrollbar.kw["command"]("scroll", "1")  # page-step right
    assert ui._view_span()[0] > 3000

    _paint(ui, 0, 799, button=3)
    kinds = {it[0] for it in ui.canvas.items}
    assert {"rectangle", "line", "text"} <= kinds
    hud = ui.canvas.items_of("text")[0][2]["text"]
    assert "mode=" in hud and "zoom=" in hud
    # unvoiced-everywhere view: background runs are all the dark color
    fills = {it[2]["fill"] for it in ui.canvas.items_of("rectangle")}
    assert "#2a2a2a" in fills


def test_f0_brush_slider_and_paint_coupling(tkpatch):
    """The brush slider rewrites voiced F0 on release; painting writes
    brush Hz (voiced) / 0 (unvoiced) into the live F0 track."""
    _, ui = _mk_ui(n=8000)
    ui.init_f0_track(np.full(8000, 200.0, np.float32))
    assert (ui.f0 == 120.0).all()             # brush default applied

    ui.f0_var.set(300.0)
    ui.f0_slider.fire("<ButtonRelease-1>")
    assert (ui.f0 == 300.0).all()

    w = ui.canvas.winfo_width()
    _paint(ui, 200, 400, button=3)            # unvoiced -> f0 zeroed
    a, b = int(200 / w * 8000), int(400 / w * 8000) + 1
    assert (ui.f0[a:b] == 0.0).all() and (ui.mask[a:b] == 0.0).all()

    ui.f0_var.set(250.0)
    _paint(ui, 250, 300, button=1)            # voiced -> brush Hz
    a2, b2 = int(250 / w * 8000), int(300 / w * 8000) + 1
    assert (ui.f0[a2:b2] == 250.0).all()

    # slider release re-applies brush over ALL voiced samples
    ui.f0_slider.fire("<ButtonRelease-1>")
    assert (ui.f0[a2:b2] == 250.0).all()
    assert (ui.f0[b:a2] == 250.0).all()


def test_lifecycle_apply_cancel_wm_delete(tkpatch):
    _, ui = _mk_ui()
    fake_tk.find_button(ui.win, "Apply").invoke()
    assert ui.ok and ui.win.destroyed

    _, ui2 = _mk_ui()
    fake_tk.find_button(ui2.win, "Cancel").invoke()
    assert not ui2.ok and ui2.win.destroyed

    _, ui3 = _mk_ui()
    ui3.win.protocols["WM_DELETE_WINDOW"]()   # window-manager close
    assert not ui3.ok and ui3.win.destroyed


def test_interactive_voicing_modal_contract(tkpatch):
    """interactive_voicing returns the edited mask on Apply, None on
    Cancel (ref: SillyEditor.py:492-502) — through the real modal flow."""
    from goofer_tpu.editor import gui

    y = np.zeros(4000, np.float32)

    def apply_scenario(win):
        canvas = fake_tk.find_all(win, fake_tk.Canvas)[0]
        canvas.fire("<Button-3>", x=0)
        canvas.fire("<B3-Motion>", x=399)     # half the 800px canvas
        canvas.fire("<ButtonRelease-3>")
        fake_tk.find_button(win, "Apply").invoke()

    fake_tk.push_scenario(apply_scenario)
    out = gui.interactive_voicing(y, SR)
    assert out is not None and out.dtype == np.float32
    b = int(399 / 800 * 4000) + 1              # _x_to_sample(399) + 1
    assert (out[:b] == 0.0).all() and (out[b:] == 1.0).all()

    def cancel_scenario(win):
        canvas = fake_tk.find_all(win, fake_tk.Canvas)[0]
        canvas.fire("<Button-3>", x=100)
        canvas.fire("<ButtonRelease-3>")
        fake_tk.find_button(win, "Cancel").invoke()

    fake_tk.push_scenario(cancel_scenario)
    assert gui.interactive_voicing(y, SR) is None


def test_play_renders_visible_span_preview(tkpatch, monkeypatch):
    """Play with features present previews the VISIBLE span through the
    engine (env/formants sliced at hop granularity, painted F0 filled)
    and hands the result to the audio device (ref: SillyEditor.py:555-563)."""
    from goofer_tpu.editor import gui

    n, hop, tframes = 8000, 256, 32
    env = np.ones((64, tframes), np.float32)
    f0i = np.full(n, 180.0, np.float32)
    vmask = np.ones(n, np.float32)
    forms = {1: np.full(tframes, 700.0, np.float32)}

    preview_calls = []

    def fake_preview(env_seg, f0_seg, mask_seg, forms_seg, sr0):
        preview_calls.append((env_seg.shape, len(f0_seg), dict(forms_seg)))
        return np.full(len(f0_seg), 0.25, np.float32)

    monkeypatch.setattr(gui, "_preview_synthesis", fake_preview)

    played = []
    sd = type(sys)("sounddevice")
    sd.play = lambda y, sr: played.append((np.asarray(y), sr))
    sd.stop = lambda: None
    monkeypatch.setitem(sys.modules, "sounddevice", sd)

    _, ui = _mk_ui(n=n, features=(env, f0i, vmask, forms, SR, n))
    ui.zoom_slider.kw["command"]("2")          # visible span = n/2
    fake_tk.find_button(ui.win, "Play").invoke()

    assert len(preview_calls) == 1 and len(played) == 1
    (env_shape, f0_len, forms_seg), (y_out, sr_out) = \
        preview_calls[0], played[0]
    a, b = ui._view_span()
    assert f0_len == b - a == n // 2
    assert env_shape == (64, -(-b // hop) - a // hop)
    assert forms_seg[1].shape[0] == env_shape[1]
    assert sr_out == SR and len(y_out) == b - a

    # without features, Play falls back to the raw waveform span
    preview_calls.clear()
    played.clear()
    _, ui2 = _mk_ui(n=n)
    fake_tk.find_button(ui2.win, "Play").invoke()
    assert not preview_calls and len(played) == 1
    assert len(played[0][0]) == n


def test_cli_goofy_editor_mode(tkpatch, tmp_path):
    """`goofer-cli a.goofy b.goofy` enters the voicing-editor batch mode
    (ref: SillySampler.py:1226-1240 mode selection; SillyEditor
    standalone surface) — through the real CLI dispatcher."""
    from goofer_tpu import cli
    from goofer_tpu.io.goofy import load_features, save_features

    n, tframes = 4000, 16
    p = tmp_path / "n_features.goofy"
    env = np.ones((513, tframes), np.float32)
    save_features(p, env, np.full(n, 150.0, np.float32),
                  np.ones(n, np.float32), {}, SR, n)

    def scenario(win):
        canvas = fake_tk.find_all(win, fake_tk.Canvas)[0]
        canvas.fire("<Button-3>", x=0)
        canvas.fire("<B3-Motion>", x=800)     # paint ALL unvoiced
        canvas.fire("<ButtonRelease-3>")
        fake_tk.find_button(win, "Apply").invoke()

    fake_tk.push_scenario(scenario)
    rc = cli.main([str(p)])
    assert rc == 0
    _, f0r, maskr, _, _, _ = load_features(p)
    assert (maskr == 0.0).all() and (f0r == 0.0).all()


def test_edit_goofy_files_writeback_and_cancel(tkpatch, tmp_path):
    """The standalone .goofy batch editor round-trip: paint unvoiced via
    the real handlers, Apply -> the file's mask/f0 reflect the edit;
    Cancel -> the file is untouched (ref: SillyEditor.py:566-637)."""
    from goofer_tpu.editor.gui import edit_goofy_files
    from goofer_tpu.io.goofy import load_features, save_features
    from goofer_tpu.utils.audio_io import write_wav

    n, tframes = 6000, 24
    rng = np.random.default_rng(7)

    def make(name):
        p = tmp_path / f"{name}_features.goofy"
        env = rng.random((513, tframes)).astype(np.float32) + 0.1
        save_features(p, env, np.full(n, 200.0, np.float32),
                      np.ones(n, np.float32),
                      {1: np.full(tframes, 700.0)}, SR, n)
        write_wav(tmp_path / f"{name}.wav",
                  np.sin(np.linspace(0, 60 * np.pi, n)) * 0.3, SR)
        return p

    p1 = make("v")
    w = 800

    def apply_scenario(win):
        canvas = fake_tk.find_all(win, fake_tk.Canvas)[0]
        canvas.fire("<Button-3>", x=200)
        canvas.fire("<B3-Motion>", x=400)
        canvas.fire("<ButtonRelease-3>")
        fake_tk.find_button(win, "Apply").invoke()

    fake_tk.push_scenario(apply_scenario)
    edit_goofy_files([str(p1)])

    _, f0r, maskr, _, srr, ylenr = load_features(p1)
    assert srr == SR and ylenr == n
    a, b = int(200 / w * n), int(400 / w * n) + 1
    assert (maskr[a:b] == 0.0).all()
    assert (maskr[:a] == 1.0).all() and (maskr[b:] == 1.0).all()
    assert (f0r[a:b] == 0.0).all()
    # brush-initialized track: voiced spans carry the 120 Hz default
    assert (f0r[:a] == 120.0).all() and (f0r[b:] == 120.0).all()

    # cancel leaves the file byte-identical
    p2 = make("u")
    before = p2.read_bytes()
    fake_tk.push_scenario(
        lambda win: fake_tk.find_button(win, "Cancel").invoke())
    edit_goofy_files([str(p2)])
    assert p2.read_bytes() == before

    # non-.goofy paths are skipped without touching anything
    edit_goofy_files([str(tmp_path / "missing.goofy"),
                      str(tmp_path / "v.wav")])
