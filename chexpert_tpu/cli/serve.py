"""Inference server — production-serving counterpart to the batch predict CLI.

    python -m chexpert_tpu.cli.serve --restore_path ckpt.msgpack \
        --model densenet121 [--port 8000]

Endpoints:
  GET  /healthz           -> {"status": "ok", "model": ..., "params": N}
  POST /predict           -> body: JPEG bytes; response: per-pathology
                             sigmoid probabilities as JSON

The model forward is jit-compiled once at a fixed micro-batch and reused for
every request (requests are padded into the static batch — no recompiles,
TPU-friendly). Threaded HTTP front end; device work is serialized through
the single compiled callable.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np

from chexpert_tpu.data import ATTR_NAMES
from chexpert_tpu.data.chexpert import PIXEL_MEAN, PIXEL_STD
from chexpert_tpu.data.transforms import center_crop, resize_min_edge


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--restore_path", type=str, required=True)
    p.add_argument("--model", default="densenet121")
    p.add_argument("--image_size", type=int, default=320)
    p.add_argument("--resize", type=int, default=None)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--micro_batch", type=int, default=1)
    p.add_argument("--compute_dtype", default="bfloat16", choices=["bfloat16", "float32"])
    return p


class Engine:
    """Compiled forward + preprocessing, shared across request threads."""

    def __init__(self, args):
        import jax.numpy as jnp

        from chexpert_tpu.checkpoint import load_model_checkpoint
        from chexpert_tpu.models import build_model
        from chexpert_tpu.train import init_model

        dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
        self.hw = args.resize or args.image_size
        self.resize = args.resize
        self.image_size = args.image_size
        self.micro_batch = args.micro_batch
        self.model_name = args.model

        model, _ = build_model(args.model, image_size=self.hw, dtype=dtype)
        params, stats = init_model(model, jax.random.PRNGKey(0), (1, self.hw, self.hw, 3))
        ck = load_model_checkpoint(args.restore_path, params, stats)
        self.variables = {"params": ck["params"], "batch_stats": ck["batch_stats"]}
        self.n_params = sum(x.size for x in jax.tree_util.tree_leaves(ck["params"]))

        @jax.jit
        def forward(variables, image):
            logits = model.apply(variables, image, train=False)
            return jax.nn.sigmoid(logits.astype(jnp.float32))

        self._forward = forward
        self._lock = threading.Lock()
        # warm the compile
        dummy = np.zeros((self.micro_batch, self.hw, self.hw, 3), np.float32)
        np.asarray(self._forward(self.variables, dummy))

    def preprocess(self, jpeg_bytes: bytes) -> np.ndarray:
        from PIL import Image

        img = Image.open(io.BytesIO(jpeg_bytes))
        if img.mode != "L":
            img = img.convert("L")
        if self.resize:
            img = resize_min_edge(img, self.resize)
        arr = np.asarray(img, dtype=np.float32)[..., None]
        arr = center_crop(arr, self.hw)
        arr = (arr / 255.0 - PIXEL_MEAN) / PIXEL_STD
        return np.broadcast_to(arr, arr.shape[:-1] + (3,))

    def predict(self, jpeg_bytes: bytes) -> dict:
        x = self.preprocess(jpeg_bytes)
        batch = np.zeros((self.micro_batch, self.hw, self.hw, 3), np.float32)
        batch[0] = x
        with self._lock:  # one compiled callable; serialize device access
            probs = np.asarray(self._forward(self.variables, batch))[0]
        return {name: float(p) for name, p in zip(ATTR_NAMES, probs)}


def make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "model": engine.model_name,
                                 "params": engine.n_params})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0 or length > 64 * 1024 * 1024:
                self._send(400, {"error": "missing or oversized body"})
                return
            data = self.rfile.read(length)
            try:
                probs = engine.predict(data)
            except Exception as e:  # bad image etc.
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send(200, {"probabilities": probs})

    return Handler


def serve(args, ready_event=None) -> ThreadingHTTPServer:
    engine = Engine(args)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(engine))
    if ready_event is not None:
        ready_event.set()
    return httpd


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from chexpert_tpu.utils.io import enable_compilation_cache

    enable_compilation_cache()
    httpd = serve(args)
    print(f"serving {args.model} on {args.host}:{httpd.server_address[1]}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
