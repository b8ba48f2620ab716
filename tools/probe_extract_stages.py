"""Stage attribution for voicebank-scale extraction (VERDICT r3 item 6).

Times the production bucketed analysis graph end-to-end (batch of 16
2 s files, the folder-extraction shape) and then each stage as its own
jitted+batched graph: STFT+envelope+knot sweep, the ACF+Viterbi pitch
tracker, the formant front (resample+Burg) and the Durand-Kerner root
iterations — plus DK at reduced iteration budgets, the candidate win
the verdict called out.

Device-only timings (block_until_ready, median of reps); the single
d2h fetch is timed separately so tunnel cost is not conflated with
compute.  Run on the TPU image: python tools/probe_extract_stages.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

cache_dir = os.path.expanduser("~/.cache/goofer_tpu/xla")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from goofer_tpu import config  # noqa: E402
from goofer_tpu.analysis.features import _analysis_graph_bucketed  # noqa: E402
from goofer_tpu.analysis.formants import (  # noqa: E402
    _burg_coeffs,
    _decimate,
    _formant_decim,
    _poly_roots_dk,
    formant_frame_grid,
)
from goofer_tpu.analysis.pitch import (  # noqa: E402
    PitchConfig,
    _frame_grid,
    pitch_graph_bucketed,
    pitch_window_len,
)
from goofer_tpu.ops.filters import gaussian_blur1d  # noqa: E402
from goofer_tpu.ops.stft import stft  # noqa: E402

SR, N_FFT, HOP, B, DUR = 44100, 1024, 256, 16, 2.0


def _voice(i: int) -> np.ndarray:
    rng = np.random.default_rng(i)
    n = int(DUR * SR)
    t = np.arange(n) / SR
    f0 = 190.0 + 20 * np.sin(2 * np.pi * 4.5 * t + i)
    ph = np.cumsum(f0 / SR)
    y = 0.35 * (2 * (ph % 1.0) - 1.0)
    y = np.convolve(y, np.hanning(9) / np.hanning(9).sum(), mode="same")
    y += 0.02 * rng.standard_normal(n)
    return y.astype(np.float32)


def timed(label, fn, *args, reps=5, audio_s=B * DUR):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) \
        else jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{label:42s} {med * 1e3:8.1f} ms   "
          f"({audio_s / med:7.1f}x realtime)", flush=True)
    return med


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ys = [_voice(i) for i in range(B)]
    n_pad = config.bucket_len(len(ys[0]) + 8 * HOP)
    pf_pad = n_pad // HOP + 2
    ff_pad = n_pad // HOP + 2
    cfg = PitchConfig(f0_min=75.0)
    dt = HOP / SR

    yb = np.zeros((B, n_pad), dtype=np.float32)
    n_true = np.empty(B, dtype=np.float32)
    p_starts = np.zeros((B, pf_pad), dtype=np.int32)
    p_nf = np.empty(B, dtype=np.int32)
    f_starts = np.zeros((B, ff_pad), dtype=np.int32)
    f_nf = np.empty(B, dtype=np.int32)
    for j, y in enumerate(ys):
        n = len(y)
        yb[j, :n] = y
        n_true[j] = n
        wlen = min(pitch_window_len(SR, cfg), max(16, n))
        nf, starts, _ = _frame_grid(n, SR, dt, wlen)
        p_nf[j] = nf
        p_starts[j, :nf] = starts
        p_starts[j, nf:] = starts[-1]
        fnf, fstarts, fwlen, _ = formant_frame_grid(n, SR, dt)
        f_nf[j] = fnf
        f_starts[j, :fnf] = fstarts
        f_starts[j, fnf:] = fstarts[-1]

    yb_d = jnp.asarray(yb)
    ps_d = jnp.asarray(p_starts)
    pn_d = jnp.asarray(p_nf)
    fs_d = jnp.asarray(f_starts)
    fn_d = jnp.asarray(f_nf)
    nt_d = jnp.asarray(n_true)

    # ---- full production graph (lean) + its fetch
    graph, k_values, shapes, splits = _analysis_graph_bucketed(
        n_pad, SR, N_FFT, HOP, 75.0, 2, True, pf_pad, ff_pad, lean=True)
    t_full = timed("FULL lean graph (device only)", graph,
                   yb_d, nt_d, ps_d, pn_d, fs_d, fn_d)
    # end-to-end including the single packed fetch (the production
    # folder-extraction rhythm)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        flat = np.asarray(graph(yb_d, nt_d, ps_d, pn_d, fs_d, fn_d))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{'FULL + packed d2h fetch':42s} {med * 1e3:8.1f} ms   "
          f"({B * DUR / med:7.1f}x realtime, {flat.nbytes / 1e6:.1f} MB)",
          flush=True)

    # ---- stage: stft + env blur + knot sweep
    from goofer_tpu.ops.envelope import (
        _decode_matrix, _knot_bin_idx, KNOT_K_MAX, KNOT_K_START,
        KNOT_K_STEP)
    n_bins = N_FFT // 2 + 1
    kv = tuple(range(KNOT_K_START, KNOT_K_MAX + 1, KNOT_K_STEP))

    @jax.jit
    @jax.vmap
    def env_stage(y):
        S = stft(y, N_FFT, HOP)
        mag = jnp.abs(S) + 1e-8
        env_spec = gaussian_blur1d(mag, 2.0, axis=0)
        env_s = gaussian_blur1d(env_spec, 0.5, axis=0)
        log_env = jnp.log(jnp.maximum(env_s, 1e-8))
        t_frames = env_spec.shape[1]
        ci = np.linspace(0, t_frames - 1, 256).astype(np.int64)
        env_check = env_s[:, ci]
        log_check = log_env[:, ci]
        errs = []
        for k in kv:
            bi = _knot_bin_idx(SR, N_FFT, k, n_bins)
            w = jnp.asarray(_decode_matrix(SR, N_FFT, k))
            recon = jnp.exp(jnp.dot(w, log_check[bi, :],
                                    preferred_element_type=jnp.float32))
            errs.append(jnp.max(jnp.abs(recon - env_check)
                                / (env_check + 1e-8)))
        return log_env, jnp.stack(errs)

    timed("stft + env + knot sweep", env_stage, yb_d)

    # ---- stage: pitch (ACF + Viterbi)
    @jax.jit
    @jax.vmap
    def pitch_stage(y, ps, pn):
        return pitch_graph_bucketed(y, SR, dt, ps, pn, cfg)

    timed("pitch: ACF + Viterbi", pitch_stage, yb_d, ps_d, pn_d)

    # ---- stage: formant front (resample + preemph + frames + Burg)
    fnf, fstarts, fwlen, _ = formant_frame_grid(len(ys[0]), SR, dt)

    from goofer_tpu.analysis.pitch import _frames_praat
    decim = _formant_decim(SR, 5500.0)
    sr2 = SR / decim
    hop2 = int(round(dt * sr2))

    @jax.jit
    @jax.vmap
    def burg_stage(y, fs, fn):
        y_rs, _sr2 = _decimate(y, float(SR), decim)
        pre = float(np.exp(-2.0 * np.pi * 50.0 / sr2))
        y_pe = y_rs - pre * jnp.concatenate([y_rs[:1] * 0, y_rs[:-1]])
        frames = _frames_praat(y_pe, fs, fn, fwlen, hop2)
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
        tg = (np.arange(fwlen) - (fwlen - 1) / 2.0) / ((fwlen - 1) / 2.0)
        gw = ((np.exp(-12.0 * tg ** 2) - np.exp(-12.0))
              / (1.0 - np.exp(-12.0))).astype(np.float32)
        return _burg_coeffs(frames * jnp.asarray(gw)[None, :], 10, fwlen)

    timed("formants: decimate + Burg", burg_stage, yb_d, fs_d, fn_d)
    coeffs = burg_stage(yb_d, fs_d, fn_d)

    # ---- stage: DK roots at several iteration budgets
    for iters in (60, 40, 24, 16):
        fn = jax.jit(jax.vmap(
            lambda c, it=iters: _poly_roots_dk(c, 10, it)))
        timed(f"DK roots, {iters} iters", fn, coeffs)

    # DK accuracy vs budget: formant drift of reduced iters vs 60
    # (fetch angles as f32 — the axon backend cannot d2h complex64)
    def angles(it):
        fn = jax.jit(jax.vmap(
            lambda c: jnp.sort(jnp.abs(jnp.angle(
                _poly_roots_dk(c, 10, it))) * sr2 / (2 * np.pi))))
        return np.asarray(fn(coeffs))

    fr60 = angles(60)
    for iters in (40, 24, 16):
        drift = np.median(np.abs(angles(iters) - fr60))
        print(f"{'  drift vs 60 iters @' + str(iters):42s} "
              f"{drift:8.2f} Hz median", flush=True)


if __name__ == "__main__":
    main()
