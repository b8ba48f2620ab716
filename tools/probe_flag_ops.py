"""Per-op costs inside the 11-flag stack at heavy-phrase shape
(VERDICT r2 weak item 2 follow-up): which flag ops are worth
reformulating.  Fetch-timed (block_until_ready does not block through
the device tunnel), batch 80 x 33k samples / 513 x 131 frames.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

os.environ.setdefault("GOOFER_TPU_CACHE",
                      os.path.expanduser("~/.cache/goofer_tpu/xla"))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["GOOFER_TPU_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from goofer_tpu.ops.envelope import env_shape  # noqa: E402
from goofer_tpu.ops.jitter import smoothed_unit_noise  # noqa: E402
from goofer_tpu.sampler.render_core import _fw_warp, _tilt  # noqa: E402

B, N = 80, 33075
NB, T = 513, 131
SR = 44100


def timed(tag, fn, *args):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        r = jax.jit(fn)(*args)
        x = r[0] if isinstance(r, tuple) else r
        float(jnp.ravel(x)[0])          # honest: fetch one element
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:42s} {best*1e3:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    env = jnp.asarray(
        np.exp(rng.normal(-3, 1, (B, NB, T))).astype(np.float32))

    timed("rtt floor (1-elem fetch)", lambda k: k * 2.0, jnp.float32(3))

    from goofer_tpu.ops.filters import gaussian_blur1d

    def full_rate_noise(k, length, sigma):
        # the pre-downsampling formulation (ops/jitter.py history)
        x = jax.random.normal(k, (length,), dtype=jnp.float32)
        x = gaussian_blur1d(x, sigma)
        return x / jnp.max(jnp.abs(x) + 1e-6)

    for sigma in (49.0, 183.75):
        timed(f"full-rate x3 jitters (sigma={sigma})",
              lambda ks, s=sigma: jax.vmap(lambda k: sum(
                  full_rate_noise(jax.random.fold_in(k, i), N, s)
                  for i in range(3)))(ks), keys)
        timed(f"production x3 jitters (auto-ds, sigma={sigma})",
              lambda ks, s=sigma: jax.vmap(lambda k: sum(
                  smoothed_unit_noise(jax.random.fold_in(k, i), N, s)
                  for i in range(3)))(ks), keys)

    timed("env_shape es=0.3 (x80)",
          lambda e: jax.vmap(lambda x: env_shape(x, 0.3))(e), env)

    def fw_warp_columns(x, amount):
        # the PRE-round-3 formulation (render_core history): general
        # per-(bin, frame) column gather on broadcast positions
        from goofer_tpu.ops.envelope import gather_lerp_columns

        nb = x.shape[0]
        bins = jnp.arange(nb, dtype=jnp.float32)
        center = nb / 2.0
        pos = jnp.clip((bins - center) * (1.0 + amount) + center,
                       0.0, nb - 1.0)
        return gather_lerp_columns(x, jnp.broadcast_to(pos[:, None],
                                                       x.shape))

    timed("fw warp (x80, column gather, OLD)",
          lambda e: jax.vmap(
              lambda x: fw_warp_columns(x, jnp.float32(0.2)))(e), env)
    timed("fw warp (x80, shared row gather, PROD)",
          lambda e: jax.vmap(lambda x: _fw_warp(x, jnp.float32(0.2)))(e),
          env)
    timed("tilt (x80)",
          lambda e: jax.vmap(lambda x: _tilt(x, jnp.float32(1.4), SR))(e),
          env)


if __name__ == "__main__":
    main()
