"""MP3 test-fixture encoder via the system libmp3lame (ctypes).

The image ships libmp3lame.so.0; encoding fixtures with it lets the
native mpg123 decode path (goofer_tpu/native/read_mp3) be validated
against independently-produced bitstreams.  Test-only helper.
"""
from __future__ import annotations

import ctypes

import numpy as np

_lame = None


def _load():
    global _lame
    if _lame is None:
        lib = ctypes.CDLL("libmp3lame.so.0")
        lib.lame_init.restype = ctypes.c_void_p
        for name in ("lame_set_in_samplerate", "lame_set_num_channels",
                     "lame_set_brate", "lame_set_quality",
                     "lame_set_mode"):
            getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.lame_init_params.argtypes = [ctypes.c_void_p]
        lib.lame_encode_buffer.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_short),
            ctypes.POINTER(ctypes.c_short), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        lib.lame_encode_flush.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        lib.lame_close.argtypes = [ctypes.c_void_p]
        _lame = lib
    return _lame


def write_mp3(path, y, sr: int, kbps: int = 192) -> None:
    """Encode float audio ((n,) or (n, 2), [-1, 1]) as MP3."""
    lib = _load()
    y = np.asarray(y, dtype=np.float64)
    stereo = y.ndim == 2
    n = y.shape[0]
    pcm = np.clip(np.round(y * 32767.0), -32768, 32767).astype(np.int16)

    gfp = lib.lame_init()
    lib.lame_set_in_samplerate(gfp, int(sr))
    lib.lame_set_num_channels(gfp, 2 if stereo else 1)
    lib.lame_set_brate(gfp, kbps)
    lib.lame_set_quality(gfp, 2)
    lib.lame_set_mode(gfp, 1 if stereo else 3)   # JOINT_STEREO / MONO
    if lib.lame_init_params(gfp) != 0:
        lib.lame_close(gfp)
        raise RuntimeError("lame_init_params failed")

    bufsize = int(1.25 * n) + 7200
    buf = (ctypes.c_ubyte * bufsize)()
    if stereo:
        left = np.ascontiguousarray(pcm[:, 0])
        right = np.ascontiguousarray(pcm[:, 1])
    else:
        left = right = np.ascontiguousarray(pcm)
    pl = left.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    pr = right.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    nb = lib.lame_encode_buffer(gfp, pl, pr, n, buf, bufsize)
    if nb < 0:
        lib.lame_close(gfp)
        raise RuntimeError(f"lame_encode_buffer failed: {nb}")
    nb2 = lib.lame_encode_flush(
        gfp, ctypes.cast(ctypes.byref(buf, nb),
                         ctypes.POINTER(ctypes.c_ubyte)), bufsize - nb)
    lib.lame_close(gfp)
    with open(path, "wb") as f:
        f.write(bytes(buf[: nb + max(nb2, 0)]))
