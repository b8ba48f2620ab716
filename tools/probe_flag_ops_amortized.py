"""Amortized on-chip A/B for the round-3 flag-op reformulations.

tools/probe_flag_ops.py measures each op once per dispatch, which puts
every result at the ~27 ms fetch-RTT floor — sub-RTT deltas drown.
Here each op repeats K times inside ONE jitted graph (distinct PRNG
keys / feed-forward chaining so XLA cannot collapse the repeats) and
the per-iteration cost is (t - rtt) / K.
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

from goofer_tpu.ops.filters import gaussian_blur1d  # noqa: E402
from goofer_tpu.ops.jitter import smoothed_unit_noise  # noqa: E402
from goofer_tpu.sampler.render_core import _fw_warp  # noqa: E402
from goofer_tpu.ops.envelope import gather_lerp_columns  # noqa: E402

B, N = 80, 33075
NB, T = 513, 131
K = 16          # repeats inside one graph


def timed(tag, fn, *args, k=K):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        r = jax.jit(fn)(*args)
        float(jnp.ravel(r)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:46s} {best*1e3:8.2f} ms total "
          f"({(best - RTT)*1e3 / k:6.2f} ms/iter)", flush=True)
    return best


def full_rate_noise(k, length, sigma):
    x = jax.random.normal(k, (length,), dtype=jnp.float32)
    x = gaussian_blur1d(x, sigma)
    return x / jnp.max(jnp.abs(x) + 1e-6)


def main():
    global RTT
    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    env = jnp.asarray(
        np.exp(rng.normal(-3, 1, (B, NB, T))).astype(np.float32))

    RTT = 0.0
    RTT = timed("rtt floor (1-elem fetch)", lambda k: k * 2.0,
                jnp.float32(3), k=1)

    # jitters: K distinct keys per note, summed — each draw is a full
    # independent noise+blur+normalize pipeline (nothing to collapse)
    for sigma in (49.0, 183.75):
        timed(f"full-rate jitter x{K} (sigma={sigma})",
              lambda ks, s=sigma: jnp.sum(jax.vmap(lambda kk: sum(
                  jnp.sum(full_rate_noise(jax.random.fold_in(kk, i), N, s))
                  for i in range(K)))(ks)), keys)
        timed(f"production jitter x{K} (auto-ds, sigma={sigma})",
              lambda ks, s=sigma: jnp.sum(jax.vmap(lambda kk: sum(
                  jnp.sum(smoothed_unit_noise(jax.random.fold_in(kk, i),
                                              N, s))
                  for i in range(K)))(ks)), keys)

    # fw warp: feed-forward chain of K warps (output -> input) so each
    # repeat is data-dependent on the last
    def fw_cols(x, amount):
        nb = x.shape[0]
        bins = jnp.arange(nb, dtype=jnp.float32)
        center = nb / 2.0
        pos = jnp.clip((bins - center) * (1.0 + amount) + center,
                       0.0, nb - 1.0)
        return gather_lerp_columns(x, jnp.broadcast_to(pos[:, None],
                                                       x.shape))

    def chain(fn):
        def run(e):
            def body(i, x):
                return fn(x, jnp.float32(0.01) + 1e-6 * i)
            return jnp.sum(jax.lax.fori_loop(
                0, K, lambda i, x: jax.vmap(
                    lambda r: body(i, r))(x), e))
        return run

    timed(f"fw warp x{K} (column gather, OLD)", chain(fw_cols), env)
    timed(f"fw warp x{K} (shared row gather, PROD)", chain(_fw_warp), env)


if __name__ == "__main__":
    main()
