"""C++ WAV codec: build, round-trips, subformat decoding, fallback."""
import struct

import numpy as np
import pytest

from goofer_tpu import native

RNG = np.random.default_rng(13)


@pytest.fixture(scope="module")
def lib():
    try:
        native.load()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native codec unavailable: {e}")
    return native


def test_roundtrip_mono(lib, tmp_path):
    y = (0.8 * np.sin(np.linspace(0, 200, 5000))).astype(np.float32)
    p = tmp_path / "m.wav"
    lib.write_wav(p, y, 44100)
    got, sr = lib.read_wav(p)
    assert sr == 44100 and got.shape == (5000,)
    np.testing.assert_allclose(got, y, atol=1.0 / 32768 + 1e-6)


def test_roundtrip_stereo(lib, tmp_path):
    y = RNG.uniform(-0.9, 0.9, size=(2000, 2)).astype(np.float32)
    p = tmp_path / "s.wav"
    lib.write_wav(p, y, 22050)
    got, sr = lib.read_wav(p)
    assert sr == 22050 and got.shape == (2000, 2)
    np.testing.assert_allclose(got, y, atol=1.0 / 32768 + 1e-6)


def _write_wav_raw(path, fmt_code, bits, sr, payload: bytes, channels=1):
    data_bytes = len(payload)
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + data_bytes))
        f.write(b"WAVEfmt ")
        byte_rate = sr * channels * bits // 8
        f.write(struct.pack("<IHHIIHH", 16, fmt_code, channels, sr,
                            byte_rate, channels * bits // 8, bits))
        f.write(b"data")
        f.write(struct.pack("<I", data_bytes))
        f.write(payload)


def test_reads_float32_and_24bit(lib, tmp_path):
    y = RNG.uniform(-0.5, 0.5, 300).astype(np.float32)
    pf = tmp_path / "f32.wav"
    _write_wav_raw(pf, 3, 32, 48000, y.tobytes())
    got, sr = lib.read_wav(pf)
    assert sr == 48000
    np.testing.assert_allclose(got, y, atol=1e-7)

    # 24-bit PCM
    ints = (y * 8388608.0).astype(np.int32)
    payload = b"".join(struct.pack("<i", v)[:3] for v in ints)
    p24 = tmp_path / "p24.wav"
    _write_wav_raw(p24, 1, 24, 32000, payload)
    got24, sr24 = lib.read_wav(p24)
    assert sr24 == 32000
    np.testing.assert_allclose(got24, y, atol=2.0 / 8388608)


def test_skips_extra_chunks(lib, tmp_path):
    """LIST/INFO chunks before data must be skipped."""
    y = RNG.uniform(-0.5, 0.5, 100).astype(np.float32)
    pcm = (np.clip(y, -1, 32767 / 32768) * 32768).astype(np.int16).tobytes()
    p = tmp_path / "chunky.wav"
    with open(p, "wb") as f:
        body = b"LIST" + struct.pack("<I", 6) + b"INFOxx"
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(body) + len(pcm)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, 44100, 88200, 2, 16))
        f.write(body)
        f.write(b"data")
        f.write(struct.pack("<I", len(pcm)))
        f.write(pcm)
    got, sr = lib.read_wav(p)
    assert sr == 44100 and len(got) == 100


def test_audio_io_uses_native(tmp_path):
    from goofer_tpu.utils import audio_io

    y = RNG.uniform(-0.9, 0.9, 1000).astype(np.float32)
    p = tmp_path / "io.wav"
    audio_io.write_wav(p, y, 44100)
    got, sr = audio_io.read_wav(p)
    assert sr == 44100
    np.testing.assert_allclose(got, y, atol=1.0 / 32768 + 1e-6)
    # scipy can read what native wrote (header sanity)
    from scipy.io import wavfile

    sr2, data = wavfile.read(p)
    assert sr2 == 44100 and data.dtype == np.int16
