"""Interactive-load floor: decompose small-batch latency into tunnel
RTT, payload bandwidth, and device compute (VERDICT r4 item 3).

Measures, on the live chip:
  1. pure dispatch+sync RTT (1-element jitted graph, block_until_ready)
  2. pure fetch RTT + bandwidth (4 B and 2 MB device->host)
  3. an 8-note 11-flag burst through render_phrase (the server path)
  4. a single-file feature extraction (the editor path)

and prints one JSON line per surface with the measured floor
decomposition: floor_ms = exec_rtt + fetch_rtt + payload_mb / d2h_bw.
If measured ~= floor, the surface is tunnel-bound and no host/device
optimization can move it — only a directly-attached TPU (where both
RTTs are microseconds and d2h is PCIe) removes it.

Usage: python tools/probe_rtt_floor.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/goofer_tpu/xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import _make_voicebank_sample
    from goofer_tpu.sampler.phrase import NoteSpec, render_phrase
    from goofer_tpu.analysis.features import extract_features_batch

    def extract_file(y, sr):
        # the production singleton path: lean bucketed batch-of-1
        # (acquire_features routes here since round 5; folder
        # extraction uses the same graphs at chunked batch)
        return extract_features_batch([y], sr, dense=False)[0]

    # --- 1. dispatch+sync RTT: trivial graph, no payload
    tiny = jax.jit(lambda x: x + 1.0)
    xd = jax.device_put(jnp.zeros((1,), jnp.float32))
    tiny(xd).block_until_ready()
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        tiny(xd).block_until_ready()
        rtts.append(time.perf_counter() - t0)
    exec_rtt = float(np.median(rtts))

    # --- 2. fetch RTT (4 B) and bandwidth (2 MB)
    big = jax.device_put(jnp.arange(1 << 20, dtype=jnp.float32))
    big.block_until_ready()
    f_rtts, bws = [], []
    for i in range(10):
        # fresh tiny slice each rep (jax.Array memoizes its host copy)
        s = (big[i: i + 1] * 1.0)
        s.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(s)
        f_rtts.append(time.perf_counter() - t0)
        buf = (big[: 1 << 19] * 1.0)
        buf.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(buf)
        dt = time.perf_counter() - t0
        bws.append((1 << 21) / 1e6 / max(dt - f_rtts[-1], 1e-9))
    fetch_rtt = float(np.median(f_rtts))
    d2h_bw = float(np.median(bws))
    print(json.dumps({
        "surface": "tunnel",
        "exec_rtt_ms": round(exec_rtt * 1e3, 1),
        "fetch_rtt_ms": round(fetch_rtt * 1e3, 1),
        "d2h_MBps": round(d2h_bw, 1),
    }), flush=True)

    sr = 44100
    tmp = tempfile.mkdtemp(prefix="goofer_floor_")
    src = os.path.join(tmp, "a.wav")
    _make_voicebank_sample(src, sr)

    # --- 3. 8-note 11-flag burst (the server's interactive path)
    heavy = "sh30sr30sg40su40sj20st-30vf40es30pd40fw20fsta50"
    scale = ["C4", "D4", "E4", "F4", "G4", "A4", "B4", "C5"]
    notes = [NoteSpec(src, scale[i], length=690, consonant=60,
                      flags=heavy + f"t{(i % 7 - 3) * 10}")
             for i in range(8)]
    audio_s = sum((n.consonant + n.length) / 1000.0 for n in notes)
    render_phrase(notes, pcm16=True, bucket=True)          # warm
    times, comp_times = [], []
    for _ in range(6):
        t0 = time.perf_counter()
        outs = render_phrase(notes, pcm16=True, bucket=True)
        times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        render_phrase(notes, pcm16=True, bucket=True, fetch=False)
        comp_times.append(time.perf_counter() - t0)
    best = min(times)
    payload_mb = sum(len(o) * 2 for o in outs) / 1e6
    # compute-only time already includes one exec RTT (block_until_ready)
    floor = min(comp_times) + fetch_rtt + payload_mb / d2h_bw
    print(json.dumps({
        "surface": "burst_8note_11flag",
        "audio_s": round(audio_s, 2),
        "best_ms": round(best * 1e3, 1),
        "x_realtime": round(audio_s / best, 1),
        "compute_sync_ms": round(min(comp_times) * 1e3, 1),
        "payload_mb": round(payload_mb, 2),
        "floor_ms": round(floor * 1e3, 1),
        "floor_x_realtime": round(audio_s / floor, 1),
        "pct_of_floor": round(100 * floor / best, 1),
    }), flush=True)

    # --- 4. single-file extraction (the editor/folder path)
    y, file_sr = None, sr
    from goofer_tpu.utils.audio_io import read_wav_mono
    y, file_sr = read_wav_mono(src)
    extract_file(y, file_sr)                               # warm
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        extract_file(y, file_sr)
        times.append(time.perf_counter() - t0)
    best = min(times)
    dur = len(y) / file_sr
    # lean payload is ~0.1 MB; the floor is two RTTs + compute
    floor = exec_rtt + fetch_rtt + 0.1 / d2h_bw
    print(json.dumps({
        "surface": "single_file_extraction",
        "audio_s": round(dur, 2),
        "best_ms": round(best * 1e3, 1),
        "x_realtime": round(dur / best, 1),
        "floor_ms": round(floor * 1e3, 1),
        "floor_x_realtime": round(dur / floor, 1),
        "pct_of_floor": round(100 * floor / best, 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
