"""Pallas TPU kernel for LF pulse accumulation.

The pulse train is the hottest op in the render graph.  The jnp lowering
pays one cummax + one N-element gather per overlap level (TPU dynamic
gathers run ~100 M elements/s); this kernel removes per-sample gathers
entirely by going block-local:

* jnp preprocessing compacts the onsets into per-generation tables
  (position, period-in-samples, period-in-seconds, peak-norm) of static
  size M — one cheap scatter with unique indices — plus the generation
  index at every block boundary;
* the kernel runs a (batch, block-octet) grid: each step handles 8
  consecutive 512-sample blocks of one batch row (the 8x512 output tile
  satisfies the f32 tiling constraint); per block it reads a SLAB of
  consecutive onset rows covering [gen(block_start) - K + 1,
  gen(block_end)] with one dynamic VMEM slice, then evaluates every
  (row, sample) pair densely on the VPU.  Out-of-window pairs mask to
  zero, so correctness needs only the same K-overlap bound as the jnp
  path (plus a minimum onset-spacing assumption sizing the slab).

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


def _pulse_block_kernel(block_gen_ref, pos_ref, t0_ref, t_ref, norm_ref,
                        out_ref, *, slab: int, k_back: int, m_rows: int,
                        Ra: float, Rg: float, Rk: float, guard: bool):
    bi = pl.program_id(0)
    c = pl.program_id(1)
    for r in range(OCTET):
        b = c * OCTET + r
        g0 = block_gen_ref[bi, b]
        start = jnp.clip(g0 - k_back, 0, m_rows - slab)

        pos = pos_ref[bi, pl.ds(start, slab)]          # (slab,) f32
        t0 = t0_ref[bi, pl.ds(start, slab)]
        ts = t_ref[bi, pl.ds(start, slab)]
        nrm = norm_ref[bi, pl.ds(start, slab)]

        base = (b * BLK).astype(jnp.float32)
        n_vec = jax.lax.broadcasted_iota(
            jnp.int32, (1, BLK), 1).astype(jnp.float32) + base

        acc = jnp.zeros((1, BLK), dtype=jnp.float32)
        for j in range(slab):
            offs = n_vec - pos[j]
            u = offs / t0[j]
            val = _lf_eval(u, ts[j], Ra, Rg, Rk, guard) / nrm[j]
            acc = acc + jnp.where((offs >= 0.0) & (offs < t0[j]), val, 0.0)
        out_ref[0, r, :] = acc[0]


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11))
def pulse_accumulate_pallas(block_gen, pos_tab, t0_tab, t_tab, norm_tab,
                            slab: int, k_back: int, Ra: float, Rg: float,
                            Rk: float, guard: bool,
                            interpret: bool = False):
    """Accumulate pulses given compact onset tables.

    block_gen: (B, n_blocks) int32 — 0-based row index of the most recent
    onset at each 512-sample block start (-1 if none); n_blocks must be a
    multiple of 8.  *_tab: (B, M) f32 compact per-generation tables; rows
    past the last onset must carry pos >= n so they never contribute.
    Returns (B, n_blocks * BLK) f32; slice to the true sample count.
    """
    bsz, n_blocks = block_gen.shape
    m_rows = pos_tab.shape[1]
    assert n_blocks % OCTET == 0
    kernel = functools.partial(
        _pulse_block_kernel, slab=slab, k_back=k_back, m_rows=m_rows,
        Ra=Ra, Rg=Rg, Rk=Rk, guard=guard)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blocks // OCTET),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OCTET, BLK), lambda bi, c: (bi, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_blocks, BLK), jnp.float32),
        interpret=interpret,
    )(block_gen, pos_tab, t0_tab, t_tab, norm_tab)
    return out.reshape(bsz, n_blocks * BLK)
