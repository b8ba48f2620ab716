"""Server burst batching probe (VERDICT r2 item 5).

An editor exporting a track fires one POST per note.  Measures 16-note
bursts against the live threaded server: (a) all 16 fired
simultaneously (merged by the BurstBatcher into ~1-2 vmapped
dispatches), (b) the same 16 fired strictly sequentially (the
reference's per-request floor).  Steady-state, warmed graphs.
"""
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

os.environ.setdefault("GOOFER_TPU_CACHE",
                      os.path.expanduser("~/.cache/goofer_tpu/xla"))
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["GOOFER_TPU_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import _make_voicebank_sample  # noqa: E402
from goofer_tpu.sampler.server import (  # noqa: E402
    RequestHandler,
    ThreadedHTTPServer,
    _batcher,
)

SR = 44100
N = 16


def post(url, body):
    req = urllib.request.Request(url, data=body.encode(), method="POST")
    with urllib.request.urlopen(req, timeout=600) as resp:
        assert resp.status == 200


def main():
    tmp = tempfile.mkdtemp(prefix="goofer_burst_")
    src = os.path.join(tmp, "src.wav")
    _make_voicebank_sample(src, SR)

    httpd = ThreadedHTTPServer(("127.0.0.1", 0), RequestHandler)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def body(j, tag):
        return (f"{src} {tmp}/{tag}{j}.wav C4 100 t{10 + j} 0 480 60 0 "
                f"100 0 !120 ABAC#3#AD")

    # warm: compile the (bucketed) burst graph and the per-note graph
    post(url, body(99, "warm"))
    for j in range(N):
        post(url, body(j, "warm2_"))
    audio_s = N * 0.54

    for rep in range(3):
        n0 = len(_batcher.batch_sizes)
        t0 = time.perf_counter()
        ts = [threading.Thread(target=post, args=(url, body(j, f"b{rep}_")))
              for j in range(N)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        burst = time.perf_counter() - t0
        sizes = _batcher.batch_sizes[n0:]
        print(f"burst rep {rep}: {N} POSTs in {burst*1e3:7.1f} ms "
              f"({audio_s/burst:6.1f}x rt)  batches={sizes}", flush=True)

    t0 = time.perf_counter()
    for j in range(N):
        post(url, body(j, "seq_"))
    seq = time.perf_counter() - t0
    print(f"sequential:  {N} POSTs in {seq*1e3:7.1f} ms "
          f"({audio_s/seq:6.1f}x rt)", flush=True)


if __name__ == "__main__":
    main()
