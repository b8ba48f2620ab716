"""HTTP resampler server, port 8572 (ref: SillySampler.py:1187-1224).

POST body = the resampler argument string (two .wav paths + the last 11
fields); GET returns 200.  Errors return 500 with a traceback body, like
the reference.  Requests are served from a thread pool; renders serialize
on the device queue but host I/O overlaps.
"""
from __future__ import annotations

import re
import traceback
from http.server import BaseHTTPRequestHandler, HTTPServer
from socketserver import ThreadingMixIn

from goofer_tpu import config


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


class RequestHandler(BaseHTTPRequestHandler):
    def do_GET(self):
        self.send_response(200)
        self.end_headers()

    def do_POST(self):
        from goofer_tpu.sampler.resampler import GooferResampler

        content_length = int(self.headers["Content-Length"])
        body = self.rfile.read(content_length).decode("utf-8")
        try:
            args = split_arguments(body)
            GooferResampler(*args)
        except Exception:
            trcbk = traceback.format_exc()
            self.send_response(500)
            self.send_header("Content-type", "text/plain")
            self.end_headers()
            self.wfile.write(f"An error occurred.\n{trcbk}".encode("utf-8"))
            return
        self.send_response(200)
        self.end_headers()


def run(port: int = config.SERVER_PORT):
    httpd = ThreadedHTTPServer(("", port), RequestHandler)
    print(f"Starting HTTP server on port {port}...")
    httpd.serve_forever()
