"""Folder-mode batch feature extraction.

The reference parallelizes over files with a CPU thread pool
(ref: SillySampler.py:211-240); here each file is one device dispatch and
the host pipelines I/O.  A `.goofy` next to the audio file short-circuits
the work — the extract-once cache doubles as the checkpoint/resume story.
"""
from __future__ import annotations

import logging
from pathlib import Path

from goofer_tpu.utils.audio_io import is_audio_file, read_wav_mono

log = logging.getLogger("goofer_tpu")


def process_file(audio_file: Path, n_fft: int = 1024,
                 hop: int = 256) -> bool:
    """Extract + cache features for one file; returns True if work done."""
    from goofer_tpu.analysis.features import extract_features
    from goofer_tpu.io.goofy import save_features

    feat_file = audio_file.with_name(f"{audio_file.stem}_features.goofy")
    if feat_file.exists():
        log.info("[SKIP] %s already exists", feat_file.name)
        return False
    try:
        log.info("[EXTRACT] %s", audio_file)
        y, sr = read_wav_mono(audio_file)
        env, f0i, vmask, forms, knots = extract_features(
            y, sr, n_fft=n_fft, hop_length=hop)
        save_features(feat_file, knots, f0i, vmask, forms, sr, len(y))
        return True
    except Exception as e:
        log.error("[ERROR] Failed to extract %s: %s", audio_file.name, e)
        return False


def extract_features_recursive(input_path, n_fft: int = 1024,
                               hop: int = 256) -> int:
    """Recursively extract features for every audio file under a path."""
    input_path = Path(input_path)
    all_files = (input_path.rglob("*") if input_path.is_dir()
                 else [input_path])
    audio_files = [f for f in all_files if f.is_file() and is_audio_file(f)]
    for f in audio_files:
        process_file(f, n_fft, hop)
    log.info("[DONE] Extracted features from %d files.", len(audio_files))
    return len(audio_files)
