"""Compile-time probe for each production graph on the live TPU.

Prints one line per graph: compile seconds + steady-state run ms.
No persistent cache — true cold costs.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

SR, NFFT, HOP = 44100, 1024, 256
N = 26460          # 0.6 s


def t(name, fn, *args):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(*args).compile()
    tc = time.perf_counter() - t0
    r = c(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = c(*args)
    jax.block_until_ready(r)
    tr = (time.perf_counter() - t0) / 3
    print(f"{name:32s} compile={tc:7.2f}s run={tr*1e3:8.2f}ms", flush=True)
    return tc


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    f0 = jnp.asarray((220.0 * np.ones(N)).astype(np.float32))
    mask = jnp.ones(N, dtype=jnp.float32)

    from goofer_tpu.ops.pulse import pulse_train
    t("pulse_train_blocked", lambda f: pulse_train(f, SR), f0)

    from goofer_tpu.ops.stft import stft, istft
    t("stft", lambda y: stft(y, NFFT, HOP), x)
    S = stft(x, NFFT, HOP)
    t("istft", lambda s: istft(s, HOP, length=N), S)

    from goofer_tpu.ops.filters import smooth_mask_downsampled, gaussian_blur1d
    t("smooth_mask_ds", lambda m: smooth_mask_downsampled(m, 100.0, 4), mask)
    t("blur_sigma20_n26460", lambda m: gaussian_blur1d(m, 20.0), mask)
    env = jnp.asarray(rng.standard_normal((513, 104)).astype(np.float32))
    t("blur_env_sigma2_axis0", lambda e: gaussian_blur1d(e, 2.0, axis=0), env)

    t("percentile95_26k", lambda m: jnp.percentile(jnp.abs(m), 95.0), x)

    from goofer_tpu.ops.scan_iir import dynamic_butter_filter
    t("dyn_butter_o6_hp", lambda y, f: dynamic_butter_filter(
        y, f, SR, 1.0, order=6, btype="highpass"), x, f0)

    from goofer_tpu.analysis.formants import formant_graph
    t("formant_graph", lambda y: formant_graph(y, SR, HOP / SR), x)

    from goofer_tpu.analysis.pitch import pitch_graph
    t("pitch_graph", lambda y: pitch_graph(y, SR, HOP / SR), x)

    # full engine synth graph, bench-typical statics
    from goofer_tpu.engine.synth import SynthStatic, default_knobs, \
        synth_core_impl
    from functools import partial
    st = SynthStatic(sr=SR, n_fft=NFFT, hop=HOP, n=N)
    tf = 104
    envf = jnp.asarray(
        (np.exp(-np.linspace(0, 5, 513))[:, None]
         * np.ones((1, tf)) + 1e-5).astype(np.float32))
    tracks = jnp.zeros((4, tf), dtype=jnp.float32)
    knobs = {k: jnp.asarray(v, dtype=jnp.float32)
             for k, v in default_knobs().items()}
    key = jax.random.PRNGKey(0)
    t("synth_core(base)", partial(synth_core_impl, st),
      envf, f0, mask, tracks, knobs, key)

    st2 = SynthStatic(sr=SR, n_fft=NFFT, hop=HOP, n=N, add_subharm=True,
                      subharm_semitones=(12.0,), subharm_vibrato=True,
                      f0_jitter=True, volume_jitter=True)
    t("synth_core(all-on)", partial(synth_core_impl, st2),
      envf, f0, mask, tracks, knobs, key)


if __name__ == "__main__":
    main()
