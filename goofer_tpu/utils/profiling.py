"""Structured tracing / profiling.

The reference's observability is ad-hoc wall-clock prints
(ref: GOOFER.py:1265-1294, test.py:24-47).  Here:

* ``StageTimer`` — named per-stage wall-clock accounting with an RTF
  summary (enable in the CLI with GOOFER_TPU_PROFILE=1);
* ``device_trace`` — context manager around ``jax.profiler`` writing an
  XPlane trace viewable in TensorBoard/Perfetto
  (GOOFER_TPU_TRACE_DIR=/path enables it in the CLI).
"""
from __future__ import annotations

import contextlib
import logging
import os
import time

log = logging.getLogger("goofer_tpu")


class StageTimer:
    """Accumulates wall-clock per named stage.

    >>> timer = StageTimer(enabled=True)
    >>> with timer.stage("synthesize"):
    ...     pass
    >>> timer.report(audio_seconds=1.0)
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, audio_seconds: float | None = None) -> str:
        lines = []
        total = sum(self.totals.values())
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            share = 100.0 * t / total if total else 0.0
            lines.append(f"  {name:<24s} {t * 1e3:9.2f} ms "
                         f"({share:5.1f}%, n={self.counts[name]})")
        header = f"[profile] total {total * 1e3:.2f} ms"
        if audio_seconds and total > 0:
            header += f", {audio_seconds / total:.1f}x realtime"
        out = "\n".join([header] + lines)
        if self.enabled:
            log.info("%s", out)
        return out


def profiling_enabled() -> bool:
    return os.environ.get("GOOFER_TPU_PROFILE", "0") not in ("", "0")


@contextlib.contextmanager
def device_trace(trace_dir: str | None = None):
    """jax.profiler trace if a directory is configured, else no-op."""
    trace_dir = trace_dir or os.environ.get("GOOFER_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("[profile] device trace written to %s", trace_dir)
