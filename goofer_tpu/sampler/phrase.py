"""Phrase renderer: batched multi-note rendering through the full flag
pipeline.

The reference renders one note per process/request; a whole phrase is N
sequential renders.  Here notes are planned on host, grouped by their
fused-graph signature (RenderStatic + array shapes), and each group runs
as ONE vmapped device dispatch of the complete render graph — feature
assembly, four synthesis layers and all post-fx included.  Notes in a
group differ freely in pitch curve, mix levels, shift ratios and all
other traced scalars.

This is the production path for offline UST rendering and the headline
benchmark; the HTTP server / CLI keep per-note dispatch for
OpenUtau-driven interactive use.
"""
from __future__ import annotations

import os
import threading
from collections import OrderedDict
from dataclasses import dataclass, replace
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from goofer_tpu import config
from goofer_tpu.sampler.resampler import GooferResampler, acquire_features
from goofer_tpu.sampler.render_core import render_note_core, default_scalars

ARRAY_ORDER = (
    "env_cut", "f0_cut", "mask_cut", "env_pos0", "env_pos1", "env_w",
    "vel_env_pos", "tracks", "tracks_raw", "pitch_ticks",
)


@dataclass
class NoteSpec:
    """One note of a phrase: the UTAU args minus the output path."""
    in_file: str
    pitch: str
    velocity: float = 100
    flags: str = ""
    offset: float = 0
    length: float = 1000
    consonant: float = 0
    cutoff: float = 0
    volume: float = 100
    modulation: float = 0
    tempo: str = "!120"
    pitch_string: str = "AA"


@dataclass
class _Planned:
    index: int
    rs: object
    arrays: dict
    scalars: dict


# Shared across the ThreadingMixIn server's handler threads and the
# dispatch pool, so every get/insert (and the clear-when-full sweep)
# happens under a lock; readers keep their own reference to the hit, so
# a concurrent clear can never yank an entry mid-use (SURVEY §5 race
# bar; tests/test_server.py::test_concurrent_posts).
_cache_lock = threading.Lock()
# LRU of vmapped-graph jit wrappers (VERDICT r3 item 7: a long OpenUtau
# session accumulates flag-combo x geometry x batch-size signatures
# without bound, and each wrapper pins its compiled executables).
# OrderedDict insertion order IS recency (hits re-insert); evicting the
# oldest wrapper drops the only strong reference to its executables.
PHRASE_GRAPH_BUDGET = int(
    os.environ.get("GOOFER_TPU_PHRASE_GRAPH_BUDGET", "64"))
_batched_core_cache: "OrderedDict" = OrderedDict()
_plan_memo: dict = {}


def _batched_core(rs, axes: tuple, pcm16: bool = False, mesh=None):
    """vmapped fused core; ``axes`` holds 0 (batched) or None (shared)
    per ARRAY_ORDER entry — arrays identical across the group are passed
    once instead of stacked B times.  ``pcm16`` appends on-device int16
    quantization (the WAV payload dtype).

    With ``mesh`` the vmapped core is wrapped in jax.shard_map (note
    batch sharded over every mesh axis, shared arrays replicated) rather
    than relying on GSPMD to partition from input shardings: the SPMD
    partitioner cannot partition the fft custom-call's batch dim and
    falls back to all-gather + every device computing EVERY note's
    FFTs (measured: 12 all-gathers, dp=8 at 0.44-0.60x the dp=1
    throughput).  Under shard_map each device runs the per-shard
    program locally — zero collectives by construction."""
    key = (rs, axes, pcm16, mesh)
    with _cache_lock:
        fn = _batched_core_cache.get(key)
        if fn is not None:
            _batched_core_cache.move_to_end(key)
    if fn is None:
        core = partial(render_note_core, rs)
        if pcm16:
            def core_pcm(*args):
                out = render_note_core(rs, *args)
                q = jnp.clip(out, -1.0, 32767.0 / 32768.0) * 32768.0
                return jnp.round(q).astype(jnp.int16)
            core = core_pcm
        # jax.jit is lazy (tracing happens at first call), so building
        # the wrapper outside the lock costs only a duplicate wrapper on
        # a race — both compile to the same executable via jax's own
        # C++ jit cache.
        vm = jax.vmap(core, in_axes=axes + (0, 0))
        if mesh is None:
            # AOT store (utils/aot.py): a fresh process deserializes the
            # exported StableHLO instead of re-tracing the ~72k-primitive
            # jaxpr (docs/PERFORMANCE.md "warm-process start").
            from goofer_tpu.utils import aot

            fn = aot.wrap("phrase", f"{rs!r}|{axes}|{pcm16}",
                          jax.jit(vm))
        else:
            from jax.sharding import PartitionSpec as P

            spec_b = P(mesh.axis_names)
            in_specs = tuple(spec_b if a == 0 else P() for a in axes)
            fn = jax.jit(jax.shard_map(
                vm, mesh=mesh, in_specs=in_specs + (spec_b, spec_b),
                out_specs=spec_b, check_vma=False))
        with _cache_lock:
            fn = _batched_core_cache.setdefault(key, fn)
            _batched_core_cache.move_to_end(key)
            while len(_batched_core_cache) > PHRASE_GRAPH_BUDGET:
                _batched_core_cache.popitem(last=False)
    return fn


# When a phrase has more distinct note geometries than this, 'auto'
# bucketing kicks in: padded-length buckets trade ~25-50% masked device
# compute for a bounded compile count.  Phrases of repeating geometry
# (the common quantized-UST case) keep exact shapes and zero padding.
AUTO_BUCKET_GEOMETRIES = 4


def _shape_key(pl: "_Planned") -> tuple:
    return tuple(np.asarray(pl.arrays[k]).shape for k in ARRAY_ORDER)


# statics that only size kernel tables/bands: grouping ignores them and
# each group harmonizes to its most conservative member, so a melody
# spanning octaves shares graphs.  Pulse spacings harmonize to the MIN
# (smaller is always safe); pulse-overlap bounds harmonize to the MAX
# (a deeper slab lookback only adds rows masked by offs < T0 in
# ops/pulse._accumulate_pulses_blocked — output-identical); the
# formant-warp band harmonizes to the MAX (wider always covers), with
# 0 = unbounded dominating.  Without the overlap fields here a scale
# spanning octaves split into two graphs (measured: the bench's 80-note
# heavy phrase paid TWO ~300 MB-generated-code executables, 69+11).
_SPACING_FIELDS = ("min_spacing", "growl_min_spacing",
                   "subharm_min_spacing", "su_min_spacing")
_OVERLAP_FIELDS = ("max_overlap", "growl_max_overlap")


def _band_merge(members):
    bands = [m.rs.warp_band for m in members]
    return 0 if any(b == 0 for b in bands) else max(bands)


def _spacing_neutral(rs):
    return replace(rs, warp_band=0,
                   **{f: config.PULSE_MIN_SPACING
                      for f in _SPACING_FIELDS},
                   **{f: config.PULSE_MAX_OVERLAP
                      for f in _OVERLAP_FIELDS})


def group_planned(planned) -> dict:
    """Group planned notes by (graph signature, array shapes), ignoring
    the pulse-spacing statics, then harmonize each group's spacing to its
    most conservative (smallest) member.  Returns {(rs, shape_key):
    [planned...]} where rs is the harmonized RenderStatic to compile."""
    groups: dict = {}
    for pl in planned:
        groups.setdefault((_spacing_neutral(pl.rs), _shape_key(pl)),
                          []).append(pl)
    return {
        (replace(key_rs, warp_band=_band_merge(members),
                 **{f: min(getattr(m.rs, f) for m in members)
                    for f in _SPACING_FIELDS},
                 **{f: max(getattr(m.rs, f) for m in members)
                    for f in _OVERLAP_FIELDS}), sk): members
        for (key_rs, sk), members in groups.items()
    }


def plan_phrase(notes, n_fft: int = config.SAMPLER_N_FFT,
                hop: int = config.SAMPLER_HOP,
                bucket: bool | str = "auto"):
    """Host-plan every note (features acquired once per source file, cut
    slices / looped tracks / pitch curves memoized across notes).

    ``bucket=True`` pads note geometry to shared length buckets so a
    phrase of arbitrary note lengths compiles only a handful of render
    graphs (resampler._bucketize); ``"auto"`` (default) buckets only when
    the phrase has more than AUTO_BUCKET_GEOMETRIES distinct geometries."""
    from goofer_tpu.io.goofy import formants_to_int_keys
    from goofer_tpu.sampler.resampler import _bucketize

    feature_cache: dict = {}
    prep_cache: dict = {}
    planned = []
    for i, spec in enumerate(notes):
        if spec.in_file not in feature_cache:
            feats = acquire_features(Path(spec.in_file), n_fft, hop)
            env, f0i, vmask, forms, sr, ylen = feats
            forms_c = formants_to_int_keys(forms)
            rev = (env[:, ::-1], f0i[::-1], vmask[::-1],
                   {k: np.asarray(forms_c[k])[::-1] for k in forms_c})
            feature_cache[spec.in_file] = (feats, forms_c, rev)
        feats, forms_c, rev = feature_cache[spec.in_file]
        env, f0i, vmask, forms, sr, ylen = feats
        # cross-call plan memo: keyed on the note spec + the IDENTITY of
        # the memoized feature tuple (a .goofy edit reloads features as a
        # new object, so stale plans can't be served).  Repeat renders of
        # the same notes — server previews, steady-state reps — skip the
        # flag decode and cut/loop/pitch planning entirely; arrays stay
        # the SAME objects, preserving in_axes=None dedupe across calls.
        mkey = (id(feats), spec.pitch, spec.velocity, spec.flags,
                spec.offset, spec.length, spec.consonant, spec.cutoff,
                spec.volume, spec.modulation, spec.tempo,
                spec.pitch_string, n_fft, hop)
        with _cache_lock:
            hit = _plan_memo.get(mkey)
        if hit is None:
            r = GooferResampler(
                spec.in_file, "/dev/null", spec.pitch, spec.velocity,
                spec.flags, spec.offset, spec.length, spec.consonant,
                spec.cutoff, spec.volume, spec.modulation, spec.tempo,
                spec.pitch_string, n_fft=n_fft, hop=hop, autorender=False)
            if r.params.reverse:
                env_use, f0_use, mask_use, forms_use = rev
            else:
                env_use, f0_use, mask_use, forms_use = (env, f0i, vmask,
                                                        forms_c)
            rs, arrays, scalars = r.prepare(env_use, f0_use, mask_use,
                                            forms_use, sr, ylen,
                                            cache=prep_cache)
            # pin feats so its id() stays unique while the entry lives
            hit = (rs, arrays, scalars, feats)
            with _cache_lock:
                if len(_plan_memo) > 4096:
                    _plan_memo.clear()
                _plan_memo[mkey] = hit
        planned.append(_Planned(i, hit[0], hit[1], hit[2]))

    if bucket == "auto":
        bucket = len({(_spacing_neutral(pl.rs), _shape_key(pl))
                      for pl in planned}) > AUTO_BUCKET_GEOMETRIES
    if bucket:
        # NOTE: unifying all length buckets into ONE graph (padding every
        # note to the phrase max, one dispatch instead of 2-4) was A/B
        # measured interleaved in one process and REJECTED: the ~16%
        # extra masked compute costs more than the saved dispatches
        # (0.326 s vs 0.305 s median on the 40-note randomized phrase)
        # and the big unified graph compiled 20x slower.  _bucketize
        # keeps the n_target hook should direct-attach hardware change
        # the trade (docs/PERFORMANCE.md).
        for pl in planned:
            pl.rs, pl.arrays = _bucketize(pl.rs, pl.arrays, prep_cache)
    return planned, feature_cache


def render_phrase(notes, n_fft: int = config.SAMPLER_N_FFT,
                  hop: int = config.SAMPLER_HOP, seed: int = 0,
                  pcm16: bool = False, bucket: bool | str = "auto",
                  mesh=None, fetch: bool = True):
    """Render a list of NoteSpec; returns list of waveforms in the input
    order.  Notes sharing a graph signature render as one vmapped
    dispatch; all dispatches are issued asynchronously before any result
    is fetched, so host<->device transfer overlaps device compute.

    With ``bucket`` (default "auto", see plan_phrase), note geometry AND
    the vmap batch size pad to shared buckets, so arbitrary phrases reuse
    a handful of compiled graphs; outputs are sliced back to true extents
    on device before fetching.

    ``mesh`` (a jax.sharding.Mesh) shards every group's note batch over
    all mesh axes — note renders are independent, so GSPMD distributes
    the same compiled graphs over ICI with no collectives (SURVEY §2.6).

    ``pcm16=True`` quantizes to int16 PCM on device — the actual payload
    of the output WAVs — halving device->host transfer.

    ``fetch=False`` is a benchmarking hook: block until every group's
    device result is ready but skip the device->host copy and return
    None — isolating compute+dispatch from tunnel/transfer time."""
    planned, _ = plan_phrase(notes, n_fft, hop, bucket=bucket)
    groups = group_planned(planned)

    # NOTE on fetch/compute overlap: splitting big groups into fetch
    # chunks was measured on this image and REJECTED — the device tunnel
    # serializes d2h transfers with execution (an 80-note heavy group:
    # 0.62 s whole vs 0.75-0.78 s in 16/32-note chunks), so chunking
    # only adds dispatch overhead.  On directly-attached TPUs, where
    # transfers overlap compute, revisit (docs/PERFORMANCE.md).

    outs: list = [None] * len(planned)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(x, batched):
            x = jnp.asarray(x)
            spec = (P(*((mesh.axis_names,) + (None,) * (x.ndim - 1)))
                    if batched else P(*((None,) * x.ndim)))
            return jax.device_put(x, NamedSharding(mesh, spec))

    def dispatch(rs, members):
        b_true = len(members)
        if mesh is not None:
            b_pad = -(-config.bucket_batch(b_true) // mesh.size) * mesh.size
        elif rs.masked:
            b_pad = config.bucket_batch(b_true)
        else:
            b_pad = b_true
        # per-note threefry keys fabricated on host: (seed, note index) —
        # distinct uint32 pairs are independent keys, and this avoids two
        # device round-trips (fold_in + split) per group
        idx = [m.index for m in members] + [0] * (b_pad - b_true)
        keys = np.stack([
            np.full(b_pad, seed & 0xFFFFFFFF, dtype=np.uint32),
            np.asarray(idx, dtype=np.uint32),
        ], axis=1)
        # arrays identical (by object) across the group ride in_axes=None;
        # numpy arrays pass straight to jit (one transfer at dispatch)
        axes = []
        stacked = []
        for k in ARRAY_ORDER:
            first = members[0].arrays[k]
            if all(m.arrays[k] is first for m in members):
                axes.append(None)
                stacked.append(np.asarray(first))
            else:
                axes.append(0)
                rows = [np.asarray(m.arrays[k]) for m in members]
                rows += [rows[-1]] * (b_pad - b_true)
                stacked.append(np.stack(rows))
        base = default_scalars()
        sc = {}
        for k, dflt in base.items():
            if np.isscalar(dflt):
                vals = np.empty(b_pad, dtype=np.float32)
                for j, m in enumerate(members):
                    vals[j] = m.scalars.get(k, dflt)
                vals[b_true:] = vals[b_true - 1]
                sc[k] = vals
            else:
                rows = [np.asarray(m.scalars.get(k, dflt), dtype=np.float32)
                        for m in members]
                rows += [rows[-1]] * (b_pad - b_true)
                sc[k] = np.stack(rows)
        fn = _batched_core(rs, tuple(axes), pcm16, mesh)
        if mesh is not None:
            stacked = [put(a, ax == 0) for a, ax in zip(stacked, axes)]
            sc = {k: put(v, True) for k, v in sc.items()}
            keys = put(keys, True)
        result = fn(*stacked, sc, keys)
        # slice padded rows AND padded tail columns off on device, so
        # bucket padding costs no device->host transfer
        max_n = max(int(m.scalars.get("n_true") or rs.n) for m in members)
        if b_pad > b_true or max_n < rs.n:
            result = result[:b_true, :max_n]
        return members, result

    # dispatch groups from a small thread pool: dispatch itself is async
    # and ~free, but FIRST calls compile — the remote XLA compile service
    # overlaps concurrent requests, cutting cold multi-graph warmup
    items = list(groups.items())
    if not items:
        return outs
    if len(items) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, len(items))) as pool:
            pending = list(pool.map(
                lambda kv: dispatch(kv[0][0], kv[1]), items))
    else:
        pending = [dispatch(items[0][0][0], items[0][1])]

    if not fetch:
        jax.block_until_ready([r for _, r in pending])
        return None
    # start every group's d2h async before blocking on the first: the
    # tunnel pipelines the per-fetch RTT across groups (the randomized
    # phrase has 3-4 groups; each serial np.asarray paid ~29 ms of RTT
    # on top of bandwidth — measured in tools/probe_rand_phrase.py)
    for _, result in pending:
        try:
            result.copy_to_host_async()
        except (AttributeError, RuntimeError):  # pragma: no cover
            pass
    for members, result in pending:
        result = np.asarray(result)          # blocks on this group only
        for j, m in enumerate(members):
            n_true = int(m.scalars.get("n_true") or result.shape[1])
            outs[m.index] = result[j][:n_true]
    return outs


def render_phrase_to_wavs(notes, out_paths, **kw):
    """Render and write one WAV per note (batch offline rendering)."""
    from goofer_tpu.utils.audio_io import write_wav
    from goofer_tpu.io.goofy import load_features

    outs = render_phrase(notes, **kw)
    # sample rate from the first note's source features
    from goofer_tpu.sampler.resampler import _feature_path

    _, _, _, _, sr, _ = load_features(_feature_path(Path(notes[0].in_file)))
    for wave, path in zip(outs, out_paths):
        write_wav(path, wave, sr)
    return outs
