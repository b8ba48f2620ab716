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

from dataclasses import dataclass
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
    "samp_pos", "vel_env_pos", "vel_samp_pos", "tracks", "pitch_ticks",
    "fry_base_w", "fry_frame_w", "fry_mask", "pd_bend",
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


_batched_core_cache: dict = {}


def _batched_core(rs, axes: tuple, pcm16: bool = False):
    """vmapped fused core; ``axes`` holds 0 (batched) or None (shared)
    per ARRAY_ORDER entry — arrays identical across the group are passed
    once instead of stacked B times.  ``pcm16`` appends on-device int16
    quantization (the WAV payload dtype)."""
    key = (rs, axes, pcm16)
    fn = _batched_core_cache.get(key)
    if fn is None:
        core = partial(render_note_core, rs)
        if pcm16:
            def core_pcm(*args):
                out = render_note_core(rs, *args)
                q = jnp.clip(out, -1.0, 32767.0 / 32768.0) * 32768.0
                return jnp.round(q).astype(jnp.int16)
            core = core_pcm
        fn = jax.jit(jax.vmap(core, in_axes=axes + (0, 0)))
        _batched_core_cache[key] = fn
    return fn


def plan_phrase(notes, n_fft: int = config.SAMPLER_N_FFT,
                hop: int = config.SAMPLER_HOP):
    """Host-plan every note (features acquired once per source file, cut
    slices / looped tracks / pitch curves memoized across notes)."""
    from goofer_tpu.io.goofy import formants_to_int_keys

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
        r = GooferResampler(
            spec.in_file, "/dev/null", spec.pitch, spec.velocity,
            spec.flags, spec.offset, spec.length, spec.consonant,
            spec.cutoff, spec.volume, spec.modulation, spec.tempo,
            spec.pitch_string, n_fft=n_fft, hop=hop, autorender=False)
        if r.params.reverse:
            env_use, f0_use, mask_use, forms_use = rev
        else:
            env_use, f0_use, mask_use, forms_use = env, f0i, vmask, forms_c
        rs, arrays, scalars = r.prepare(env_use, f0_use, mask_use,
                                        forms_use, sr, ylen,
                                        cache=prep_cache)
        planned.append(_Planned(i, rs, arrays, scalars))
    return planned, feature_cache


def render_phrase(notes, n_fft: int = config.SAMPLER_N_FFT,
                  hop: int = config.SAMPLER_HOP, seed: int = 0,
                  pcm16: bool = False):
    """Render a list of NoteSpec; returns list of waveforms in the input
    order.  Notes sharing a graph signature render as one vmapped
    dispatch; all dispatches are issued asynchronously before any result
    is fetched, so host<->device transfer overlaps device compute.

    ``pcm16=True`` quantizes to int16 PCM on device — the actual payload
    of the output WAVs — halving device->host transfer."""
    planned, _ = plan_phrase(notes, n_fft, hop)

    groups: dict = {}
    for pl in planned:
        shape_key = tuple(np.asarray(pl.arrays[k]).shape
                          for k in ARRAY_ORDER)
        groups.setdefault((pl.rs, shape_key), []).append(pl)

    outs: list = [None] * len(planned)
    pending = []
    for (rs, _shape_key), members in groups.items():
        # per-note threefry keys fabricated on host: (seed, note index) —
        # distinct uint32 pairs are independent keys, and this avoids two
        # device round-trips (fold_in + split) per group
        keys = np.stack([
            np.full(len(members), seed & 0xFFFFFFFF, dtype=np.uint32),
            np.asarray([m.index for m in members], dtype=np.uint32),
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
                stacked.append(np.stack(
                    [np.asarray(m.arrays[k]) for m in members]))
        base = default_scalars()
        sc = {}
        for k, dflt in base.items():
            if np.isscalar(dflt):
                sc[k] = np.fromiter(
                    (m.scalars.get(k, dflt) for m in members),
                    dtype=np.float32, count=len(members))
            else:
                sc[k] = np.stack([np.asarray(m.scalars.get(k, dflt),
                                             dtype=np.float32)
                                  for m in members])
        fn = _batched_core(rs, tuple(axes), pcm16)
        pending.append((members, fn(*stacked, sc, keys)))

    for members, result in pending:
        result = np.asarray(result)          # blocks on this group only
        for j, m in enumerate(members):
            outs[m.index] = result[j]
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
