"""In-process harness for the TRUE upstream reference (/root/reference).

VERDICT r2 item 1: the parity chain must terminate at the actual
reference code, not at a restatement of it.  The reference's synthesis
path needs only three trivial dependency stubs to run in this image:

* ``numba``   — ``njit``/``vectorize`` as passthrough decorators (the
  decorated loops are pure Python/NumPy and run unchanged, just slower);
* ``soundfile`` — a read/write shim over scipy's RIFF codec with
  libsndfile's float conventions (int16/32768 on read, PCM_16 on
  write), plus an optional pre-quantization capture hook so tests can
  compare the reference's FLOAT output exactly;
* ``sounddevice`` — no-op playback (SillyEditor imports it at top
  level; the resample chain never plays audio).

``parselmouth`` gets a bare placeholder module: GOOFER.py imports it at
top level but only ``extract_features`` touches it, and the resample
chain never calls that when fed a prebuilt ``.goofy``
(ref: GOOFER.py:952-954 are inside extract_features).

The stubs are installed into ``sys.modules`` only if the real packages
are absent, and ``goofer_tpu.utils.audio_io`` is pinned to its
non-soundfile path afterwards so production code never routes through
the shim by accident.

Ref: SillySampler.py:286-1185 (the chain under test), GOOFER.py:971-1220.
"""
from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

REFERENCE_DIR = Path("/root/reference")


def _numba_stub() -> types.ModuleType:
    mod = types.ModuleType("numba")
    mod.__goofer_stub__ = True

    def njit(*args, **kwargs):
        # supports both @njit and @njit(fastmath=True, cache=True)
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(fn):
            return fn

        return deco

    def vectorize(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return np.vectorize(args[0])

        def deco(fn):
            return np.vectorize(fn)

        return deco

    mod.njit = njit
    mod.jit = njit
    mod.vectorize = vectorize
    mod.prange = range
    return mod


def _soundfile_stub() -> types.ModuleType:
    from scipy.io import wavfile

    mod = types.ModuleType("soundfile")
    mod.__goofer_stub__ = True
    mod.captures = []          # (path, float_data, sr) when capture=True
    mod.capture = False

    def read(path, dtype="float64", **_kw):
        sr, data = wavfile.read(str(path))
        if data.dtype == np.int16:
            data = data.astype(np.float64) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float64) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float64) - 128.0) / 128.0
        else:
            data = data.astype(np.float64)
        return data, int(sr)

    def write(path, data, samplerate, **_kw):
        data = np.asarray(data)
        if mod.capture:
            mod.captures.append((str(path), np.array(data, copy=True),
                                 int(samplerate)))
        q = np.clip(np.asarray(data, np.float64), -1.0, 1.0 - 1.0 / 32768.0)
        wavfile.write(str(path), int(samplerate),
                      (q * 32768.0).astype(np.int16))

    mod.read = read
    mod.write = write
    return mod


def _sounddevice_stub() -> types.ModuleType:
    mod = types.ModuleType("sounddevice")
    mod.__goofer_stub__ = True
    mod.play = lambda *a, **k: None
    mod.stop = lambda *a, **k: None
    mod.wait = lambda *a, **k: None
    return mod


def _parselmouth_stub() -> types.ModuleType:
    mod = types.ModuleType("parselmouth")
    mod.__goofer_stub__ = True
    return mod


_STUB_MAKERS = {
    "numba": _numba_stub,
    "soundfile": _soundfile_stub,
    "sounddevice": _sounddevice_stub,
    "parselmouth": _parselmouth_stub,
}

_loaded = None


def install_stubs() -> None:
    for name, maker in _STUB_MAKERS.items():
        if name in sys.modules:
            continue
        try:
            __import__(name)           # real package present: leave it
        except ImportError:
            sys.modules[name] = maker()
    # keep production audio I/O off the shim even though it now imports
    try:
        from goofer_tpu.utils import audio_io

        if getattr(audio_io._sf, "__goofer_stub__", False):
            audio_io._sf = None
    except Exception:
        pass


def load_reference():
    """Import the upstream modules (idempotent).  Returns
    (GOOFER, SillySampler, soundfile_module)."""
    global _loaded
    if _loaded is None:
        install_stubs()
        if str(REFERENCE_DIR) not in sys.path:
            sys.path.insert(0, str(REFERENCE_DIR))
        import GOOFER          # noqa: F401  (upstream module names)
        import SillySampler    # noqa: F401

        _loaded = (GOOFER, SillySampler, sys.modules["soundfile"])
    return _loaded


class zero_noise:
    """Context manager: wrap the reference's ``gf.synthesize`` so calls
    that don't pass uv_strength/breath_strength explicitly get 0.0 —
    the same zeroing the oracle tests apply on their side
    (tests/test_resample_oracle.py uv0 path).  Explicit values (the sa
    layer's uv_strength=1.0, SillySampler.py:1160-1171) pass through."""

    def __init__(self):
        self.gf = load_reference()[0]
        self._orig = self.gf.synthesize

    def __enter__(self):
        orig = self._orig

        def wrapped(*args, **kwargs):
            kwargs.setdefault("uv_strength", 0.0)
            kwargs.setdefault("breath_strength", 0.0)
            return orig(*args, **kwargs)

        self.gf.synthesize = wrapped
        return self

    def __exit__(self, *exc):
        self.gf.synthesize = self._orig
        return False


class capture_kernel_inputs:
    """Record the f0 arrays the upstream chain feeds its two sequential
    kernels (``pulse_train_numba``, ``add_subharms``), in call order.

    Purpose (see tests/test_ref_upstream.py): the oracle's restated f0
    chain agrees with upstream only to f32 op-ordering ulps, and the
    pulse phase accumulator turns ulp noise into whole-sample onset
    flips.  Capturing the exact upstream kernel inputs lets the cert
    test split the comparison into (a) f0-chain closeness at
    milli-Hz tolerance and (b) bitwise-identical kernel inputs for the
    waveform comparison — float-exact end to end, no exclusions."""

    def __init__(self):
        self.gf = load_reference()[0]
        self.pulse_f0 = []
        self.subharm_calls = []

    def __enter__(self):
        gf = self.gf
        self._pt = gf.pulse_train_numba
        self._as = gf.add_subharms
        cap = self

        def pt(f0, sr, **kw):
            cap.pulse_f0.append(np.array(f0, copy=True))
            return cap._pt(f0, sr, **kw)

        def asb(f0, sr, **kw):
            cap.subharm_calls.append(
                (np.array(f0, copy=True),
                 {k: (np.array(v, copy=True) if isinstance(v, np.ndarray)
                      else v) for k, v in kw.items()}))
            return cap._as(f0, sr, **kw)

        gf.pulse_train_numba = pt
        gf.add_subharms = asb
        return self

    def __exit__(self, *exc):
        self.gf.pulse_train_numba = self._pt
        self.gf.add_subharms = self._as
        return False


def render_reference(in_wav, out_wav, pitch, velocity, flags, offset,
                     length, consonant, cutoff, volume, modulation,
                     tempo, pitch_string, *, seed=None, capture=True):
    """Run upstream ``GooferResampler`` in-process on a prebuilt
    wav + .goofy pair; returns the pre-quantization float output when
    ``capture`` (else None).  ``seed`` pins NumPy's global RNG and
    ``default_rng`` so stochastic flag families (sh/sr/sd/sa/sj) become
    reproducible for committed goldens."""
    gf, ss, sf = load_reference()
    restore_rng = None
    if seed is not None:
        np.random.seed(seed)
        restore_rng = np.random.default_rng

        # Reproducible but INDEPENDENT streams per default_rng() call:
        # the real upstream entropy-seeds each call (one per synthesize
        # noise block, volume jitter, growl...), so pinning every call
        # to the SAME stream would correlate noise across layers — the
        # layered stems then add coherently and the render comes out
        # ~2 dB hot (caught when production's independent noise measured
        # quieter than a pinned-rng golden).  Advancing the seed per
        # call keeps renders reproducible without that artifact.
        calls = iter(range(1 << 30))

        def seeded_rng(s=None, _seed=seed):
            return restore_rng(_seed + next(calls) if s is None else s)

        np.random.default_rng = seeded_rng
    if capture:
        sf.captures.clear()
        sf.capture = True
    try:
        ss.GooferResampler(str(in_wav), str(out_wav), str(pitch),
                           str(velocity), str(flags), str(offset),
                           str(length), str(consonant), str(cutoff),
                           str(volume), str(modulation), str(tempo),
                           str(pitch_string))
    finally:
        sf.capture = False
        if restore_rng is not None:
            np.random.default_rng = restore_rng
    if capture:
        assert sf.captures, "reference wrote no output"
        return sf.captures[-1][1]
    return None
