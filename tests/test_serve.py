"""HTTP inference server over an exported artifact (mrclip_tpu/serve.py)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from mrclip_tpu.factory import create_model
from mrclip_tpu.serve import make_server
from mrclip_tpu.serving import export_model, save_exported


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    model, variables = create_model("ViT-B-32-mini")
    path = str(tmp_path_factory.mktemp("srv") / "m.mrclip")
    save_exported(export_model(model, variables, batch_size=None), path)
    srv = make_server(path, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    return json.loads(urllib.request.urlopen(req).read())


def test_health(server):
    res = json.loads(urllib.request.urlopen(server + "/health").read())
    assert res["ok"] is True
    assert res["meta"]["context_length"] == 32


def test_encode_and_score(server):
    res = _post(server, "/encode_text", {"texts": ["a brain MRI", "a knee MRI"]})
    assert np.asarray(res["features"]).shape == (2, 64)
    imgs = np.random.RandomState(0).rand(2, 64, 64, 3).tolist()
    res = _post(server, "/score", {"images": imgs, "texts": ["a", "b", "c"]})
    assert np.asarray(res["logits"]).shape == (2, 3)


def test_error_paths(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/encode_text", {"wrong": 1})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        req = urllib.request.Request(
            server + "/encode_text", b"not json", {"Content-Type": "application/json"}
        )
        urllib.request.urlopen(req)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/nope", {})
    assert e.value.code == 404
