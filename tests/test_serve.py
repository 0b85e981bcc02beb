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


def test_dynamic_batching_concurrent_requests(server):
    """16 concurrent encode_text requests coalesce through the batcher and
    every client gets ITS rows back (order/slicing correctness under load)."""
    texts = [f"an MRI of subject {i}" for i in range(16)]
    singles = {
        t: np.asarray(_post(server, "/encode_text", {"texts": [t]})["features"])[0]
        for t in texts[:3]
    }

    results = {}
    errors = []

    def hit(t):
        try:
            results[t] = np.asarray(
                _post(server, "/encode_text", {"texts": [t]})["features"]
            )[0]
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=hit, args=(t,)) for t in texts]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert len(results) == 16
    for t, want in singles.items():
        np.testing.assert_allclose(results[t], want, atol=1e-5)


def test_batcher_unit_coalesces_and_splits():
    """_Batcher slices the concatenated output back per-caller and
    propagates exceptions to every waiter."""
    from mrclip_tpu.serve import _Batcher

    calls = []

    def fn(arr):
        calls.append(len(arr))
        return arr * 2.0

    b = _Batcher(fn, max_batch=8, window_s=0.25)
    outs = {}
    ts = []
    for i in range(4):
        a = np.full((2, 3), float(i))
        t = threading.Thread(target=lambda a=a, i=i: outs.__setitem__(i, b(a)))
        ts.append(t)
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for i in range(4):
        np.testing.assert_allclose(outs[i], np.full((2, 3), float(i)) * 2.0)
    assert sum(calls) == 8  # every row served exactly once
    assert len(calls) < 4  # at least some coalescing happened

    def bad(arr):
        raise RuntimeError("boom")

    b2 = _Batcher(bad, max_batch=4, window_s=0.01)
    with pytest.raises(RuntimeError):
        b2(np.zeros((1, 3)))


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


def test_batcher_survives_malformed_payload():
    """A scalar/0-d payload must be rejected in the caller's thread and must
    NOT kill the worker: subsequent well-formed requests still answer
    (review fix: the coalescing logic used to run outside the try block, so
    one bad request hung the endpoint forever)."""
    from mrclip_tpu.serve import _Batcher

    b = _Batcher(lambda a: a + 1.0, max_batch=4, window_s=0.01)
    with pytest.raises(ValueError, match="batch"):
        b(np.float32(5.0))  # 0-d: len() would raise inside the worker
    # worker is still alive and serving
    np.testing.assert_allclose(b(np.zeros((2, 3))), np.ones((2, 3)))


def test_score_applies_logit_bias(tmp_path):
    """/score must use the artifact's full formula scale * img @ txt.T +
    logit_bias (SigLIP exports carry a real bias; review fix: the endpoint
    re-implemented the formula without the bias term)."""
    model, variables = create_model("ViT-B-32-mini")
    path = str(tmp_path / "m.mrclip")
    save_exported(export_model(model, variables, batch_size=None), path)

    srv = make_server(path, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    imgs = np.random.RandomState(0).rand(1, 64, 64, 3).tolist()
    try:
        img_feats = np.asarray(_post(base, "/encode_image", {"images": imgs})["features"])
        txt_feats = np.asarray(_post(base, "/encode_text", {"texts": ["a"]})["features"])
        res = np.asarray(_post(base, "/score", {"images": imgs, "texts": ["a"]})["logits"])
    finally:
        srv.shutdown()
    # reconstruct with the artifact meta (bias defaults to 0.0 for CLIP)
    from mrclip_tpu.serving import load_exported

    meta = load_exported(path).meta
    want = meta.get("logit_scale", 100.0) * img_feats @ txt_feats.T + meta.get(
        "logit_bias", 0.0
    )
    np.testing.assert_allclose(res, want, rtol=1e-5)
    assert "logit_bias" in meta  # exports always record the bias term
