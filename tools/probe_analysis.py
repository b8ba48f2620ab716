"""Compile-time breakdown of the fused analysis graph on the TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

N, SR, NFFT, HOP = 26460, 44100, 1024, 256

def t(name, fn, *args):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(*args).compile()
    tc = time.perf_counter() - t0
    print(f"{name:34s} compile={tc:7.2f}s", flush=True)
    return c

rng = np.random.default_rng(0)
y = jnp.asarray(rng.standard_normal(N).astype(np.float32))

from goofer_tpu.analysis.features import _analysis_graph
g, kv, _shapes, _splits = _analysis_graph(N, SR, NFFT, HOP, 75.0, 2, True)
t0 = time.perf_counter()
g.lower(y).compile()
print(f"{'FUSED analysis graph':34s} compile={time.perf_counter()-t0:7.2f}s", flush=True)

from goofer_tpu.analysis.pitch import pitch_graph, PitchConfig, fix_f0_gaps
from goofer_tpu.analysis.formants import formant_graph
from goofer_tpu.ops.stft import stft
from goofer_tpu.ops.filters import gaussian_blur1d
from goofer_tpu.ops.interp import gather_lerp
from goofer_tpu.ops.envelope import _knot_bin_idx, _decode_matrix

def env_part(y):
    S = stft(y, NFFT, HOP)
    return gaussian_blur1d(jnp.abs(S) + 1e-8, 2.0, axis=0)
t("env (stft+blur)", env_part, y)

def pitch_part(y):
    f0 = pitch_graph(y, SR, HOP/SR, PitchConfig())
    f0 = fix_f0_gaps(jnp.nan_to_num(f0), 2)
    pos = jnp.linspace(0.0, f0.shape[0]-1.0, N)
    return gather_lerp(f0, pos, axis=0)
t("pitch+gaps+interp", pitch_part, y)

t("formants", lambda y: formant_graph(y, SR, HOP/SR), y)

def knots_part(env):
    env_s = gaussian_blur1d(env, 0.5, axis=0)
    log_env = jnp.log(jnp.maximum(env_s, 1e-8))
    tfr = env.shape[1]
    check = np.linspace(0, tfr-1, min(256, tfr)).astype(np.int64)
    ec, lc = env_s[:, check], log_env[:, check]
    errs = []
    for k in range(32, 193, 16):
        bi = _knot_bin_idx(SR, NFFT, k, NFFT//2+1)
        w = jnp.asarray(_decode_matrix(SR, NFFT, k))
        recon = jnp.exp(jnp.dot(w, lc[bi, :], preferred_element_type=jnp.float32))
        errs.append(jnp.max(jnp.abs(recon - ec)/(ec+1e-8)))
    return jnp.stack(errs)
env = np.abs(rng.standard_normal((513, 104))).astype(np.float32) + 1e-4
t("knot sweep", knots_part, jnp.asarray(env))
