"""Recording tkinter substitute for driving the editor GUI headless.

The real editor event loop (goofer_tpu/editor/gui.py) is ~435 LoC of
tkinter wiring that cannot run without a display.  This module fakes the
small tkinter surface the editor uses — widgets record their pack/bind/
command wiring and canvas draw calls instead of rendering — so tests can
construct ``VoicingEditorUI``, fire the *bound* handlers exactly as Tk
would (button presses, motion, key bindings, slider callbacks), and
assert on the resulting state and ``.goofy`` write-backs.

Usage: ``monkeypatch.setitem(sys.modules, "tkinter", fake_tk)`` and
``monkeypatch.setitem(sys.modules, "tkinter.ttk", fake_tk.ttk)`` —
gui.py imports tkinter lazily inside each entry point, so injection at
call time is sufficient.  Scripted modal flows (``interactive_voicing``,
``edit_goofy_files``) register scenarios with :func:`push_scenario`;
``Tk.wait_window`` pops and runs one per modal window, standing in for
the real blocking event loop.
"""
from __future__ import annotations

import types

# tkinter pack/orient constants (string values match real tkinter)
BOTH, X, Y, NONE = "both", "x", "y", "none"
LEFT, RIGHT, TOP, BOTTOM = "left", "right", "top", "bottom"
HORIZONTAL, VERTICAL = "horizontal", "vertical"

#: every widget ever constructed (newest last); tests may inspect this
CREATED: list = []

#: queue of ``fn(toplevel)`` callables consumed by ``Tk.wait_window``
SCENARIOS: list = []


def reset():
    CREATED.clear()
    SCENARIOS.clear()


def push_scenario(fn):
    SCENARIOS.append(fn)


class Event(types.SimpleNamespace):
    """Stand-in for a tkinter event (only .x/.y are read by the GUI)."""


class _Widget:
    def __init__(self, master=None, **kw):
        self.master = master
        self.kw = kw
        self.children = []
        self.bindings = {}
        self.pack_calls = []
        self.destroyed = False
        if master is not None and hasattr(master, "children"):
            master.children.append(self)
        CREATED.append(self)

    def pack(self, **kw):
        self.pack_calls.append(kw)

    def bind(self, seq, fn):
        self.bindings[seq] = fn

    def fire(self, seq, **event_kw):
        """Invoke a bound handler the way Tk would on that event."""
        return self.bindings[seq](Event(**event_kw))

    def winfo_width(self):
        return self.kw.get("_width", 800)

    def winfo_height(self):
        return self.kw.get("_height", 220)

    def destroy(self):
        self.destroyed = True
        for c in self.children:
            c.destroy()


class Frame(_Widget):
    pass


class Label(_Widget):
    pass


class Button(_Widget):
    def invoke(self):
        return self.kw["command"]()


class Scale(_Widget):
    pass


class Scrollbar(_Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self.set_calls = []

    def set(self, lo, hi):
        self.set_calls.append((float(lo), float(hi)))


class Canvas(_Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self.items = []

    def delete(self, _tag):
        self.items.clear()

    def create_rectangle(self, *coords, **kw):
        self.items.append(("rectangle", coords, kw))

    def create_line(self, *coords, **kw):
        self.items.append(("line", coords, kw))

    def create_text(self, *coords, **kw):
        self.items.append(("text", coords, kw))

    def items_of(self, kind):
        return [it for it in self.items if it[0] == kind]


class Toplevel(_Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self._title = ""
        self._geometry = ""
        self.protocols = {}

    def title(self, t):
        self._title = t

    def geometry(self, g):
        self._geometry = g

    def protocol(self, name, fn):
        self.protocols[name] = fn


class Tk(Toplevel):
    def __init__(self, **kw):
        super().__init__(None, **kw)
        self.withdrawn = False

    def withdraw(self):
        self.withdrawn = True

    def wait_window(self, win):
        """Run the next scripted scenario against the modal window.

        Mirrors the real contract: wait_window returns once ``win`` is
        destroyed (every scenario must end in Apply/Cancel/WM_DELETE)."""
        if SCENARIOS:
            SCENARIOS.pop(0)(win)
        if not win.destroyed:
            raise AssertionError(
                "scenario left the modal window open; wait_window would "
                "block forever")


class DoubleVar:
    def __init__(self, value=0.0):
        self._v = float(value)

    def get(self):
        return self._v

    def set(self, v):
        self._v = float(v)


class StringVar:
    def __init__(self, value=""):
        self._v = str(value)

    def get(self):
        return self._v

    def set(self, v):
        self._v = str(v)


class Combobox(_Widget):
    """Recording ttk.Combobox: tests set the textvariable then fire
    ``<<ComboboxSelected>>`` the way Tk does after a dropdown pick."""

    def configure(self, **kw):
        self.kw.update(kw)

    def selection_clear(self):
        pass

    def select(self, value):
        """Test helper: pick ``value`` from the dropdown (sets the
        textvariable, then fires the selection event like real Tk)."""
        assert value in self.kw.get("values", ()), value
        self.kw["textvariable"].set(value)
        self.fire("<<ComboboxSelected>>")


# ---------------------------------------------------------------- helpers

def find_all(root, cls):
    """All widgets of ``cls`` in the tree under ``root`` (root included)."""
    out = [root] if isinstance(root, cls) else []
    for c in getattr(root, "children", []):
        out.extend(find_all(c, cls))
    return out


def find_button(root, text):
    for b in find_all(root, Button):
        if b.kw.get("text") == text:
            return b
    raise KeyError(f"no button {text!r}")


# ``from tkinter import ttk`` target: a module object whose classes are
# the same recording widgets (the GUI treats ttk/tk widgets uniformly).
ttk = types.ModuleType("tkinter.ttk")
ttk.Frame = Frame
ttk.Label = Label
ttk.Button = Button
ttk.Scale = Scale
ttk.Scrollbar = Scrollbar
ttk.Combobox = Combobox
