"""HTTP resampler server, port 8572 (ref: SillySampler.py:1187-1224).

POST body = the resampler argument string (two .wav paths + the last 11
fields); GET returns 200.  Errors return 500 with a traceback body, like
the reference.  Requests are served from a thread pool.

Beyond the reference's per-request contract: an editor exporting a track
fires one POST per note in a burst; requests arriving within a short
window are merged into ONE vmapped phrase dispatch
(sampler/phrase.render_phrase — VERDICT r2 item 5), so a 16-note burst
costs ~2 dispatch+fetch floors instead of 16.  Singletons and SE1
(blocking editor) requests keep the per-request path; any batch failure
falls back to per-note rendering so error bodies stay per-request.
"""
from __future__ import annotations

import logging
import re
import threading
import time
import traceback
from http.server import BaseHTTPRequestHandler, HTTPServer
from socketserver import ThreadingMixIn

from goofer_tpu import config

log = logging.getLogger("goofer_tpu")


def split_arguments(input_string: str) -> list:
    """Split a POST body into [in.wav, out.wav, *last 11 fields]
    (ref: SillySampler.py:1187-1194)."""
    otherargs = input_string.split(" ")[-11:]
    file_path_strings = " ".join(input_string.split(" ")[:-11])
    parts = re.findall(r"([^\s]+\.wav)", file_path_strings)
    if len(parts) < 2:
        raise ValueError("Missing .wav file paths in POST string")
    return [parts[0], parts[1]] + otherargs


class ThreadedHTTPServer(ThreadingMixIn, HTTPServer):
    pass


class _Request:
    __slots__ = ("args", "done", "error")

    def __init__(self, args):
        self.args = args
        self.done = threading.Event()
        self.error = None


class BurstBatcher:
    """Merge POSTs arriving within ``window_s`` into one vmapped phrase
    dispatch.  Thread-safe; the batcher thread starts lazily."""

    WINDOW_S = 0.025
    MAX_BATCH = 64
    # below this, the per-note path wins: it reuses the warmed
    # single-note graphs (universal + specialized), while a small
    # vmapped phrase graph would compile fresh per batch-size bucket
    # (~20 s each, measured — tools/probe_server_burst.py)
    MIN_PHRASE = 4
    # phrase batches pad up (replicating the last note) to the smallest
    # covering rung, so 3 compiled graphs serve every 4-16-note burst
    # and a 5-note burst pays an 8-wide dispatch, not 16 (VERDICT r4
    # item 4; rung sizes are bucket_batch fixed points, so the phrase
    # dispatcher doesn't re-round them).  Bursts beyond the top rung
    # ride config.bucket_batch's own series.
    PHRASE_PAD_LADDER = (4, 8, 16)

    def __init__(self):
        self._cond = threading.Condition()
        self._pending: list[_Request] = []
        self._thread = None
        # observability for tests/probes: sizes of dispatched batches
        # and the ladder rung each one padded to
        self.batch_sizes: list[int] = []
        self.pad_sizes: list[int] = []

    def submit(self, args) -> None:
        """Enqueue a 13-arg render; blocks until it completes.  Raises
        the per-request error, if any."""
        req = _Request(args)
        with self._cond:
            if self._thread is None:
                self._thread = threading.Thread(
                    target=self._loop, daemon=True,
                    name="goofer-burst-batcher")
                self._thread.start()
            self._pending.append(req)
            self._cond.notify()
        req.done.wait()
        if req.error is not None:
            raise req.error

    # ------------------------------------------------------------------

    def _loop(self):
        while True:
            with self._cond:
                while not self._pending:
                    self._cond.wait()
            # collect the burst: one POST per note arrives within ms
            time.sleep(self.WINDOW_S)
            with self._cond:
                batch = self._pending[: self.MAX_BATCH]
                del self._pending[: len(batch)]
            if batch:
                self._render(batch)

    def _render(self, batch):
        self.batch_sizes.append(len(batch))
        if len(batch) >= self.MIN_PHRASE:
            try:
                self._render_batched(batch)
                return
            except Exception:
                # any planning/dispatch failure: per-note fallback keeps
                # error bodies per-request — but a persistent phrase-path
                # bug must not degrade every burst silently (VERDICT r4
                # item 5), so log the cause before falling back
                log.exception(
                    "burst phrase dispatch failed for %d notes; "
                    "falling back to per-note rendering", len(batch))
        for req in batch:
            self._render_one(req)

    def _render_one(self, req):
        from goofer_tpu.editor.gui import available_interactive_hook
        from goofer_tpu.sampler.resampler import GooferResampler

        try:
            GooferResampler(*req.args,
                            editor_hook=available_interactive_hook())
        except Exception as e:
            req.error = e
        finally:
            req.done.set()

    def _render_batched(self, batch):
        from pathlib import Path

        from goofer_tpu.sampler.phrase import NoteSpec, render_phrase
        from goofer_tpu.sampler.resampler import acquire_features
        from goofer_tpu.utils.audio_io import write_wav

        notes = [NoteSpec(r.args[0], *r.args[2:]) for r in batch]
        # bucket=True (not "auto"): interactive bursts favor graph reuse
        # across note lengths over exact-geometry compiles.  The batch
        # pads by replicating the last note up to the smallest covering
        # PHRASE_PAD_LADDER rung (4/8/16), so three compiled vmapped
        # graphs serve every burst size without the old pad-to-16's up
        # to 4x wasted device compute on mid-size bursts
        pad = next((r for r in self.PHRASE_PAD_LADDER
                    if r >= len(notes)), len(notes))
        self.pad_sizes.append(pad)
        if len(notes) < pad:
            notes = notes + [notes[-1]] * (pad - len(notes))
        outs = render_phrase(notes, pcm16=True, bucket=True)
        for req, out in zip(batch, outs):
            try:
                _, _, _, _, sr, _ = acquire_features(
                    Path(req.args[0]), config.SAMPLER_N_FFT,
                    config.SAMPLER_HOP)
                write_wav(req.args[1], out, sr)
            except Exception as e:
                req.error = e
            finally:
                req.done.set()


_batcher = BurstBatcher()


class RequestHandler(BaseHTTPRequestHandler):
    def do_GET(self):
        self.send_response(200)
        self.end_headers()

    def do_POST(self):
        from goofer_tpu.editor.gui import available_interactive_hook
        from goofer_tpu.sampler.flags import NoteParams
        from goofer_tpu.sampler.resampler import GooferResampler

        content_length = int(self.headers["Content-Length"])
        body = self.rfile.read(content_length).decode("utf-8")
        try:
            args = split_arguments(body)
            # SE1 opens the blocking editor when a display exists, same
            # contract as the CLI path (ref: SillySampler.py:581-611) —
            # those requests keep the direct per-request path; everything
            # else merges into burst batches (one vmapped dispatch per
            # POST burst).
            params = NoteParams.from_args(*args[2:])
            if params.use_editor:
                GooferResampler(*args,
                                editor_hook=available_interactive_hook())
            else:
                _batcher.submit(args)
        except Exception:
            trcbk = traceback.format_exc()
            self.send_response(500)
            self.send_header("Content-type", "text/plain")
            self.end_headers()
            self.wfile.write(f"An error occurred.\n{trcbk}".encode("utf-8"))
            return
        self.send_response(200)
        self.end_headers()


def _background_warmup():
    """Compile the common render graphs before the first request.

    The reference warms its Numba kernels at import (ref: GOOFER.py:1224,
    test.py:6); the XLA equivalent is rendering one tiny synthetic note
    through the full pipeline so an editor's first real request doesn't
    pay the cold compile.  Runs in a daemon thread; failures only mean
    the first request compiles instead."""
    import os
    import tempfile
    import traceback as _tb

    import numpy as np

    try:
        from goofer_tpu.sampler.resampler import GooferResampler
        from goofer_tpu.utils.audio_io import write_wav

        sr = 44100
        tmp = tempfile.mkdtemp(prefix="goofer_warmup_")
        src = os.path.join(tmp, "w.wav")
        t = np.arange(int(0.4 * sr)) / sr
        y = 0.3 * np.sign(np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
        write_wav(src, y, sr)
        GooferResampler(src, os.path.join(tmp, "out.wav"), "C4", 100, "",
                        0, 300, 60, 0, 100, 0, "!120", "AA")
        print("Warmup render done; graphs compiled.", flush=True)

        # the burst batcher's vmapped phrase graphs — one per
        # PHRASE_PAD_LADDER rung (4/8/16) — compile them now so a first
        # track export doesn't stall on any burst size
        from goofer_tpu.sampler.phrase import NoteSpec, render_phrase

        for rung in BurstBatcher.PHRASE_PAD_LADDER:
            notes = [NoteSpec(src, "C4", length=250 + 17 * i,
                              consonant=60, flags=f"t{10 + i}")
                     for i in range(rung)]
            render_phrase(notes, pcm16=True, bucket=True)
            print(f"Burst phrase graph ready (batch {rung}).", flush=True)

        # universal fallback graphs: after this, a first-sight flag
        # combo renders immediately through the covering universal
        # graph while its specialized graph compiles in the background
        # (resampler.render_note_auto; VERDICT r2 item 2).  With the
        # persistent XLA cache this deserializes instead of compiling.
        from goofer_tpu.sampler.resampler import (
            WARM_SAMPLE_RATES,
            warm_universal,
        )

        # full ladder (VERDICT r3 item 1): note lengths 0.75-8 s at the
        # common voicebank rates, 44.1 kHz first so the most likely
        # requests are covered earliest; other rates warm lazily on
        # first cover miss (resampler._warm_ladder_background)
        n = 0
        for rate in WARM_SAMPLE_RATES:
            n += warm_universal(sr=rate)
            print(f"Universal fallback graphs ready for {rate} Hz "
                  f"({n} compiled total).", flush=True)
    except Exception:
        print(f"Warmup render failed (first request will compile):\n"
              f"{_tb.format_exc()}", flush=True)


def run(port: int = config.SERVER_PORT, warmup: bool = True):
    import threading

    httpd = ThreadedHTTPServer(("", port), RequestHandler)
    if warmup:
        threading.Thread(target=_background_warmup, daemon=True).start()
    print(f"Starting HTTP server on port {port}...")
    httpd.serve_forever()
