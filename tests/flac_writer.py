"""Minimal spec-correct FLAC encoder — test fixture generator.

The image has no FLAC tooling (no soundfile/ffmpeg/flac binaries), so the
native decoder (goofer_tpu/native/sndcodec.cpp) is validated against
bitstreams produced here.  This is an *encoder for tests*: it makes no
attempt at good compression, but every bitstream it emits is valid FLAC
(correct STREAMINFO, frame headers with CRC-8/CRC-16, UTF-8 frame
numbers), and it can deliberately exercise each decoder path: subframe
types CONSTANT / VERBATIM / FIXED(0-4) / LPC, Rice and Rice2 partitions
(any order) with escape codes, wasted bits, and the four stereo channel
assignments.  Spec: https://xiph.org/flac/format.html.
"""
from __future__ import annotations

import numpy as np

FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

CH_ASSIGN = {"indep": None, "left_side": 8, "right_side": 9, "mid_side": 10}

_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}

# natural frame-header blocksize codes (everything else: explicit 16-bit)
_BS_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
            256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
            8192: 13, 16384: 14, 32768: 15}


class BitWriter:
    def __init__(self):
        self._bytes = bytearray()
        self._cur = 0
        self._nbits = 0

    def bits(self, n: int, v: int):
        assert n >= 0 and 0 <= v < (1 << n), (n, v)
        for i in range(n - 1, -1, -1):
            self._cur = (self._cur << 1) | ((v >> i) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self._bytes.append(self._cur)
                self._cur = 0
                self._nbits = 0

    def sbits(self, n: int, v: int):
        self.bits(n, v & ((1 << n) - 1))

    def unary(self, q: int):
        while q >= 32:
            self.bits(32, 0)
            q -= 32
        self.bits(q + 1, 1)

    def align(self):
        if self._nbits:
            self.bits(8 - self._nbits, 0)

    def bytes_aligned(self) -> bytes:
        assert self._nbits == 0
        return bytes(self._bytes)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def _utf8_number(bw: BitWriter, v: int):
    if v < 0x80:
        bw.bits(8, v)
        return
    # payload capacity of an n-byte sequence: (7 - n) + 6*(n - 1) bits
    nbytes = 2
    while v >= (1 << ((7 - nbytes) + 6 * (nbytes - 1))):
        nbytes += 1
        assert nbytes <= 7, "number exceeds 36 bits"
    tails = []
    for _ in range(nbytes - 1):
        tails.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | v
    bw.bits(8, lead)
    for t in reversed(tails):
        bw.bits(8, t)


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _write_residual(bw: BitWriter, resid, order: int, blocksize: int,
                    porder: int = 0, method: int = 0,
                    escape_partitions=()):
    """Rice-code ``resid`` (len blocksize - order)."""
    assert blocksize % (1 << porder) == 0
    bw.bits(2, method)           # 0 = 4-bit rice, 1 = 5-bit rice2
    bw.bits(4, porder)
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    idx = 0
    for part in range(1 << porder):
        count = (blocksize >> porder) - (order if part == 0 else 0)
        assert count >= 0
        vals = resid[idx: idx + count]
        idx += count
        if part in escape_partitions:
            raw = max((int(abs(int(v))).bit_length() + 1 for v in vals),
                      default=1)
            raw = min(raw, 31)
            bw.bits(param_bits, escape)
            bw.bits(5, raw)
            for v in vals:
                bw.sbits(raw, int(v))
            continue
        # pick a workable rice parameter from the mean magnitude
        mean = float(np.mean(np.abs(np.asarray(vals, np.float64)))) \
            if len(vals) else 0.0
        param = max(0, min(escape - 1, int(mean).bit_length()))
        bw.bits(param_bits, param)
        for v in vals:
            u = _zigzag(int(v))
            bw.unary(u >> param)
            if param:
                bw.bits(param, u & ((1 << param) - 1))
    assert idx == len(resid)


def _write_subframe(bw: BitWriter, x, bps: int, mode: str, order: int = 2,
                    porder: int = 0, method: int = 0, wasted: int = 0,
                    lpc_coefs=None, lpc_shift: int = 9,
                    lpc_precision: int = 12, escape_partitions=()):
    x = [int(v) for v in x]
    blocksize = len(x)
    bw.bits(1, 0)
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in x), "wasted bits not free"
        x = [v >> wasted for v in x]
    ebps = bps - wasted

    if mode == "constant":
        assert all(v == x[0] for v in x)
        bw.bits(6, 0)
    elif mode == "verbatim":
        bw.bits(6, 1)
    elif mode == "fixed":
        assert 0 <= order <= 4
        bw.bits(6, 8 + order)
    elif mode == "lpc":
        assert lpc_coefs and 1 <= len(lpc_coefs) <= 32
        order = len(lpc_coefs)
        bw.bits(6, 32 + (order - 1))
    else:
        raise ValueError(mode)

    if wasted:
        bw.bits(1, 1)
        bw.unary(wasted - 1)
    else:
        bw.bits(1, 0)

    if mode == "constant":
        bw.sbits(ebps, x[0])
        return
    if mode == "verbatim":
        for v in x:
            bw.sbits(ebps, v)
        return
    for v in x[:order]:                      # warmup
        bw.sbits(ebps, v)
    if mode == "fixed":
        coefs = FIXED_COEFS[order]
        resid = [x[n] - sum(c * x[n - 1 - j] for j, c in enumerate(coefs))
                 for n in range(order, blocksize)]
    else:
        assert all(abs(c) < (1 << (lpc_precision - 1)) for c in lpc_coefs)
        bw.bits(4, lpc_precision - 1)
        bw.sbits(5, lpc_shift)
        for c in lpc_coefs:
            bw.sbits(lpc_precision, c)
        resid = [x[n] - (sum(c * x[n - 1 - j]
                             for j, c in enumerate(lpc_coefs)) >> lpc_shift)
                 for n in range(order, blocksize)]
    _write_residual(bw, resid, order, blocksize, porder, method,
                    escape_partitions)


def write_flac(path, samples, sr: int, bps: int = 16, blocksize: int = 256,
               mode: str = "fixed", channel_mode: str = "indep",
               **subframe_kw) -> None:
    """Encode ``samples`` (int array, (n,) or (n, ch)) as a FLAC file.

    ``mode``/``subframe_kw`` select the subframe coding for every channel;
    ``channel_mode`` one of indep / left_side / right_side / mid_side
    (stereo only).
    """
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    assert samples.min() >= lo and samples.max() <= hi, "exceeds bps"
    if channel_mode != "indep":
        assert ch == 2, "stereo decorrelation needs 2 channels"

    out = bytearray(b"fLaC")
    si = BitWriter()
    si.bits(16, min(blocksize, n or blocksize))   # min block size
    si.bits(16, blocksize)
    si.bits(24, 0)                                # min/max frame size unknown
    si.bits(24, 0)
    si.bits(20, sr)
    si.bits(3, ch - 1)
    si.bits(5, bps - 1)
    si.bits(36, n)
    body = si.bytes_aligned() + b"\x00" * 16      # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_idx = 0
    for start in range(0, n, blocksize):
        block = samples[start: start + blocksize]
        bs = len(block)
        bw = BitWriter()
        bw.bits(14, 0x3FFE)
        bw.bits(1, 0)
        bw.bits(1, 0)                             # fixed-blocksize strategy
        bs_code = _BS_CODE.get(bs, 7)             # natural code or explicit
        bw.bits(4, bs_code)
        bw.bits(4, 0)                             # sr from STREAMINFO
        asgn = CH_ASSIGN[channel_mode]
        bw.bits(4, (ch - 1) if asgn is None else asgn)
        bw.bits(3, _SS_CODE.get(bps, 0))
        bw.bits(1, 0)
        _utf8_number(bw, frame_idx)
        if bs_code == 7:
            bw.bits(16, bs - 1)
        bw.bits(8, crc8(bw.bytes_aligned()))

        if asgn is None:
            chans = [(block[:, c], bps) for c in range(ch)]
        else:
            left = block[:, 0].astype(np.int64)
            right = block[:, 1].astype(np.int64)
            side = left - right
            if channel_mode == "left_side":
                chans = [(left, bps), (side, bps + 1)]
            elif channel_mode == "right_side":
                chans = [(side, bps + 1), (right, bps)]
            else:                                 # mid_side
                mid = (left + right) >> 1
                chans = [(mid, bps), (side, bps + 1)]
        for data, cbps in chans:
            _write_subframe(bw, data, cbps, mode, **subframe_kw)
        bw.align()
        bw.bits(16, crc16(bw.bytes_aligned()))
        out += bw.bytes_aligned()
        frame_idx += 1

    with open(path, "wb") as f:
        f.write(out)
