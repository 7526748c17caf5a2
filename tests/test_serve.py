"""Inference server: health, predict, error paths. Runs the real HTTP stack
against a tiny checkpoint on an ephemeral port."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from chexpert_tpu.checkpoint import save_model_checkpoint
from chexpert_tpu.data import ATTR_NAMES
from chexpert_tpu.models import build_model
from chexpert_tpu.train import init_model


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    model, _ = build_model("densenet-tiny", image_size=32, dtype=jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
    ckpt = str(d / "checkpoint.msgpack")
    save_model_checkpoint(ckpt, params, stats, 0)

    from chexpert_tpu.cli.serve import build_parser, serve

    args = build_parser().parse_args([
        "--restore_path", ckpt, "--model", "densenet-tiny",
        "--image_size", "32", "--port", "0", "--compute_dtype", "float32",
    ])
    httpd = serve(args)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _jpeg_bytes(hw=48):
    rng = np.random.RandomState(0)
    buf = io.BytesIO()
    Image.fromarray(rng.randint(0, 255, (hw, hw), dtype=np.uint8), "L").save(
        buf, format="JPEG")
    return buf.getvalue()


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok" and body["model"] == "densenet-tiny"
    assert body["params"] > 0


def test_predict(server):
    req = urllib.request.Request(server + "/predict", data=_jpeg_bytes(),
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    probs = body["probabilities"]
    assert set(probs) == set(ATTR_NAMES)
    assert all(0.0 <= v <= 1.0 for v in probs.values())


def test_predict_deterministic(server):
    def call():
        req = urllib.request.Request(server + "/predict", data=_jpeg_bytes(),
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())["probabilities"]

    assert call() == call()


def test_predict_bad_body(server):
    req = urllib.request.Request(server + "/predict", data=b"not a jpeg",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_unknown_route(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/nope")
    assert e.value.code == 404
