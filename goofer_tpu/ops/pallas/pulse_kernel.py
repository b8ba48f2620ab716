"""Pallas TPU kernel for LF pulse accumulation.

The pulse train is the hottest op in the render graph.  The jnp blocked
lowering gathers a slab of onset rows per 128-sample block and then
materializes an (n_blocks, slab, blk) contribution tensor for XLA to
fuse; this kernel keeps the same block-local decomposition but performs
the dense evaluation in VMEM with explicit accumulation, so the only HBM
traffic is the (tiny) slab tables in and one output tile out:

* jnp preprocessing compacts the onsets into per-generation tables
  (position, period-in-samples, period-in-seconds, peak-norm) — one
  cheap scatter with unique indices — and pre-gathers, per 512-sample
  block, the SLAB of consecutive onset rows covering
  [gen(block_start) - K + 1, gen(block_end)] (one XLA gather of
  n_blocks*slab elements);
* the kernel runs a (batch, block-octet) grid: each step handles 8
  consecutive 512-sample blocks of one batch row (the 8x512 output tile
  satisfies the f32 tiling constraint).  The slab tables arrive as SMEM
  blocks — scalar reads with static indices, no dynamic VMEM slicing
  (Mosaic requires 128-lane-provable offsets for those) — and every
  (row, sample) pair is evaluated densely on the VPU.  Out-of-window
  pairs mask to zero, so correctness needs only the same K-overlap bound
  as the jnp path (plus the minimum onset-spacing assumption that sizes
  the slab).

Everything is f32; the LF shape matches ops/pulse.lf_pulse_value
(including the Numba epsilon guards when ``guard=True``).

Batching is explicit (a grid axis), NOT via jax.vmap — the wrapper in
ops/pulse.py reshapes unbatched calls to batch size 1 and jax.vmap of the
whole pulse_train falls back to this same 2-D grid through a custom
batching path (see ``pulse_accumulate_pallas``'s caller).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512
OCTET = 8  # blocks per grid step; makes the output tile (8, 512)


def _lf_eval(u, T, Ra, Rg, Rk, guard):
    uc = Ra + Rk * (1.0 - Ra)
    if guard:
        rise = jnp.sin(jnp.pi * u * T / (2.0 * Ra * T + 1e-12)) ** 2
        tau = (u - Ra) * T / ((uc - Ra) * T + 1e-12)
    else:
        rise = jnp.sin(jnp.pi * u / (2.0 * Ra)) ** 2
        tau = (u - Ra) / (uc - Ra)
    decay = jnp.exp(-Rg * tau) * jnp.cos(jnp.pi * tau / 2.0)
    out = jnp.where(u < Ra, rise, jnp.where(u < uc, decay, 0.0))
    return jnp.where((u >= 0.0) & (u < 1.0), out, 0.0)


def _pulse_block_kernel(pos_ref, t0_ref, t_ref, norm_ref, out_ref, *,
                        slab: int, Ra: float, Rg: float, Rk: float,
                        guard: bool):
    c = pl.program_id(1)
    for r in range(OCTET):
        base = ((c * OCTET + r) * BLK).astype(jnp.float32)
        n_vec = jax.lax.broadcasted_iota(
            jnp.int32, (1, BLK), 1).astype(jnp.float32) + base

        acc = jnp.zeros((1, BLK), dtype=jnp.float32)
        for j in range(slab):
            p = pos_ref[0, r, j]                       # SMEM scalars
            t0 = t0_ref[0, r, j]
            ts = t_ref[0, r, j]
            nrm = norm_ref[0, r, j]
            offs = n_vec - p
            u = offs / t0
            val = _lf_eval(u, ts, Ra, Rg, Rk, guard) / nrm
            acc = acc + jnp.where((offs >= 0.0) & (offs < t0), val, 0.0)
        out_ref[0, r, :] = acc[0]


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def pulse_accumulate_pallas(pos_slab, t0_slab, t_slab, norm_slab,
                            slab: int, Ra: float, Rg: float,
                            Rk: float, guard: bool,
                            interpret: bool = False):
    """Accumulate pulses given per-block slab tables.

    ``*_slab``: (B, n_blocks, slab) f32 — for each 512-sample block, the
    consecutive onset rows that can contribute to it (pre-gathered from
    the compact tables; rows past the last onset must carry pos >= n so
    they never contribute).  n_blocks must be a multiple of 8.
    Returns (B, n_blocks * BLK) f32; slice to the true sample count.
    """
    bsz, n_blocks, _ = pos_slab.shape
    assert n_blocks % OCTET == 0
    kernel = functools.partial(
        _pulse_block_kernel, slab=slab, Ra=Ra, Rg=Rg, Rk=Rk, guard=guard)
    slab_spec = pl.BlockSpec((1, OCTET, slab),
                             lambda bi, c: (bi, c, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blocks // OCTET),
        in_specs=[slab_spec, slab_spec, slab_spec, slab_spec],
        out_specs=pl.BlockSpec((1, OCTET, BLK), lambda bi, c: (bi, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_blocks, BLK), jnp.float32),
        interpret=interpret,
    )(pos_slab, t0_slab, t_slab, norm_slab)
    return out.reshape(bsz, n_blocks * BLK)
