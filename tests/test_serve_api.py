"""OpenAI-compatible serving endpoint (examples/serve_openai.py) driven
over real HTTP on the CPU debug model: non-streaming completion, SSE
streaming, concurrent clients sharing the PagedBatcher, and the
engine-level-sampling rejection."""

import json
import sys
import os
import threading
import urllib.request
from http.server import ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

import pytest


@pytest.fixture(scope="module")
def server():
    from serve_openai import ServingEngine, main, make_handler  # noqa: F401
    import argparse

    args = argparse.Namespace(
        model_path=None, adapter_path=None, debug=True,
        slots=3, n_pages=64, max_pages_per_seq=8,
        temperature=0.0, top_p=1.0, decode_impl=None, speculative=2,
        steps_per_dispatch=2, admit_batch=2)
    engine = ServingEngine(args)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    engine.shutdown()


def _post(url, payload, timeout=300, path="/v1/completions"):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def test_models_endpoint(server):
    d = json.loads(urllib.request.urlopen(server + "/v1/models").read())
    assert d["data"][0]["id"] == "debug"


def test_completion_non_streaming(server):
    r = _post(server, {"prompt": "hello there", "max_tokens": 6})
    d = json.loads(r.read())
    assert d["object"] == "text_completion"
    assert d["choices"][0]["finish_reason"] == "stop"
    assert d["usage"]["completion_tokens"] <= 6
    assert d["usage"]["prompt_tokens"] == len("hello there")


def test_completion_streaming_sse(server):
    r = _post(server, {"prompt": "abc", "max_tokens": 5, "stream": True})
    body = r.read().decode()
    events = [ln[6:] for ln in body.splitlines() if ln.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
    assert all(c["object"] == "text_completion" for c in chunks)


def test_concurrent_clients_share_engine(server):
    results = {}

    def one(i):
        r = _post(server, {"prompt": f"client {i} says", "max_tokens": 4})
        results[i] = json.loads(r.read())

    ts = [threading.Thread(target=one, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert len(results) == 4
    for d in results.values():
        assert d["choices"][0]["finish_reason"] == "stop"
        assert 0 < d["usage"]["completion_tokens"] <= 4


def test_mismatched_sampling_params_rejected(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"prompt": "x", "max_tokens": 2, "temperature": 0.7})
    assert e.value.code == 400


def test_chat_completion_non_streaming(server):
    r = _post(server, {"messages": [
        {"role": "system", "content": "Be terse."},
        {"role": "user", "content": "hi"}], "max_tokens": 6},
        path="/v1/chat/completions")
    d = json.loads(r.read())
    assert d["object"] == "chat.completion"
    m = d["choices"][0]["message"]
    assert m["role"] == "assistant"
    assert "### Human:" not in m["content"]
    assert d["choices"][0]["finish_reason"] == "stop"


def test_chat_completion_streaming(server):
    r = _post(server, {"messages": [{"role": "user", "content": "hello"}],
                       "max_tokens": 6, "stream": True},
              path="/v1/chat/completions")
    body = r.read().decode()
    events = [ln[6:] for ln in body.splitlines() if ln.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    text = "".join(c["choices"][0]["delta"].get("content", "")
                   for c in chunks)
    assert "### Human:" not in text
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
