"""HTTP server mode: live POST round-trip on a local port."""
import threading
import urllib.request

import numpy as np
import pytest

from goofer_tpu.sampler.server import ThreadedHTTPServer, RequestHandler
from goofer_tpu.utils.audio_io import read_wav
from goofer_tpu.utils.profiling import StageTimer

from tests.test_resampler import _make_sample


@pytest.fixture(scope="module")
def server():
    httpd = ThreadedHTTPServer(("127.0.0.1", 0), RequestHandler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_get_returns_200(server):
    with urllib.request.urlopen(server) as resp:
        assert resp.status == 200


def test_post_renders_note(server, tmp_path):
    wav = tmp_path / "src.wav"
    _make_sample(wav)
    out = tmp_path / "rendered.wav"
    body = f"{wav} {out} C4 100 g0 0 300 50 0 100 0 !120 AA"
    req = urllib.request.Request(server, data=body.encode(), method="POST")
    with urllib.request.urlopen(req, timeout=600) as resp:
        assert resp.status == 200
    y, sr = read_wav(out)
    assert sr == 44100 and len(y) > 0
    assert np.max(np.abs(y)) > 0.01


def test_post_bad_args_returns_500(server):
    req = urllib.request.Request(server, data=b"garbage", method="POST")
    try:
        urllib.request.urlopen(req, timeout=60)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 500
        assert b"An error occurred" in e.read()
    assert raised


def test_stage_timer_report():
    t = StageTimer(enabled=True)
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report(audio_seconds=1.0)
    assert "a" in rep and "n=2" in rep and "realtime" in rep
