"""Minimal inference server over exported StableHLO artifacts.

Production-serving counterpart to `serving.py`: loads a `.mrclip` artifact
(no model code needed) and answers JSON over HTTP with embeddings or
image<->text scores. Stdlib-only (http.server), thread-per-request; the
compiled encoders are thread-safe jax calls.

Run: `python -m mrclip_tpu.serve --model model.mrclip --port 8080`

API:
  POST /encode_text   {"texts": ["a brain MRI ..."]}           -> {"features": [[...]]}
  POST /encode_image  {"images": [[...HWC floats...]]}          -> {"features": [[...]]}
  POST /score         {"images": [...], "texts": [...]}         -> {"logits": [[...]]}
  GET  /health                                                  -> {"ok": true, "meta": {...}}
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .serving import load_exported
from .tokenizer import SimpleTokenizer

__all__ = ["make_server", "main"]


def make_server(artifact_path: str, host: str = "0.0.0.0", port: int = 8080):
    served = load_exported(artifact_path)
    tokenizer = SimpleTokenizer(context_length=served.meta.get("context_length", 98))
    lock = threading.Lock()  # single accelerator: serialize compute

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"ok": True, "meta": served.meta})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                return self._json(400, {"error": f"bad json: {e}"})

            try:
                if self.path == "/encode_text":
                    tokens = tokenizer(req["texts"])
                    with lock:
                        feats = served.encode_text(tokens)
                    return self._json(200, {"features": np.asarray(feats).tolist()})
                if self.path == "/encode_image":
                    images = np.asarray(req["images"], np.float32)
                    with lock:
                        feats = served.encode_image(images)
                    return self._json(200, {"features": np.asarray(feats).tolist()})
                if self.path == "/score":
                    images = np.asarray(req["images"], np.float32)
                    tokens = tokenizer(req["texts"])
                    with lock:
                        img = np.asarray(served.encode_image(images))
                        txt = np.asarray(served.encode_text(tokens))
                    logits = served.meta.get("logit_scale", 100.0) * img @ txt.T
                    return self._json(200, {"logits": logits.tolist()})
                return self._json(404, {"error": "unknown path"})
            except KeyError as e:
                return self._json(400, {"error": f"missing field {e}"})
            except Exception as e:  # surface shape/dtype issues to the client
                return self._json(500, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    parser = argparse.ArgumentParser("mrclip_tpu.serve")
    parser.add_argument("--model", required=True, help="path to a .mrclip export")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    args = parser.parse_args(argv)
    server = make_server(args.model, args.host, args.port)
    print(f"serving {args.model} on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
