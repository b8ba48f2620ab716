"""UTAU pitch-string decoding: base64-style 12-bit signed cent deltas with
``#<n>#`` run-length encoding (ref: SillySampler.py:56-84)."""
from __future__ import annotations

import numpy as np


def to_uint6(c: str) -> int:
    o = ord(c)
    if o >= 97:
        return o - 71
    if o >= 65:
        return o - 65
    if o >= 48:
        return o + 4
    if o == 43:
        return 62
    if o == 47:
        return 63
    raise ValueError(f"Bad b64 '{c}'")


def to_int12(pair: str) -> int:
    v = (to_uint6(pair[0]) << 6) | to_uint6(pair[1])
    return v - 4096 if (v & 0x800) else v


def to_int12_stream(s: str) -> list:
    return [to_int12(s[i:i + 2]) for i in range(0, len(s), 2)]


def pitch_string_to_cents(x: str) -> np.ndarray:
    parts = x.split("#")
    out: list = []
    for i in range(0, len(parts), 2):
        chunk = parts[i:i + 2]
        if len(chunk) == 2:
            ps, run = chunk
            out += to_int12_stream(ps)
            out += [out[-1]] * int(run)
        else:
            out += to_int12_stream(chunk[0])
    arr = np.array(out, dtype=np.float32)
    return arr if arr.size else np.array([0.0], dtype=np.float32)
