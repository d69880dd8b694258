"""Web chat demo (examples/web_demo.py) — parity surface of the
reference's Gradio Colab notebook: streaming SSE replies, prompt
flattening, stop-string truncation, webhook conversation logging."""

import json
import sys
import threading
import urllib.request
from argparse import Namespace
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))

import pytest


@pytest.fixture(scope="module")
def server():
    import web_demo

    args = Namespace(debug=True, model_path=None, adapter_path=None,
                     temperature=0.7, top_p=0.9, max_new_tokens=8)
    engine = web_demo.ChatEngine(args)

    hooked = []

    class Hook(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            hooked.append(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

    hook_srv = ThreadingHTTPServer(("127.0.0.1", 0), Hook)
    threading.Thread(target=hook_srv.serve_forever, daemon=True).start()
    webhook = f"http://127.0.0.1:{hook_srv.server_port}/"

    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              web_demo.make_handler(engine, webhook))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", hooked
    srv.shutdown()
    hook_srv.shutdown()


def test_build_prompt_matches_notebook_format():
    import web_demo

    p = web_demo.build_prompt([("hi", "hello")], "bye")
    assert p == "### Human: hi### Assistant: hello### Human: bye### Assistant:"


def test_index_page_served(server):
    url, _ = server
    html = urllib.request.urlopen(url + "/").read().decode()
    assert "qlora_tpu" in html and "/chat" in html


def test_chat_streams_sse_and_logs_webhook(server):
    url, hooked = server
    req = urllib.request.Request(
        url + "/chat",
        json.dumps({"history": [["a", "b"]], "message": "hi"}).encode(),
        {"Content-Type": "application/json"})
    body = urllib.request.urlopen(req, timeout=120).read().decode()
    events = [json.loads(e[6:]) for e in body.split("\n\n")
              if e.startswith("data: ")]
    assert events[-1] == {"done": True}
    deltas = [e["delta"] for e in events if "delta" in e]
    # webhook got the completed turn with the full reply
    assert hooked and hooked[-1]["turn"][0] == "hi"
    assert hooked[-1]["turn"][1] == "".join(deltas)
    assert hooked[-1]["history"] == [["a", "b"]]


def test_stop_string_truncates_stream():
    """stream_reply cuts at '### Human:' and never emits a partial stop
    prefix (the notebook's StoppingCriteria semantics)."""
    # drive the hold-back logic directly on a fake token stream
    from qlora_tpu.utils.testing import FakeTokenizer

    tok = FakeTokenizer()
    text = "yes.### Human: sneak"
    ids = tok.encode(text)

    # replicate the generator's hold-back loop over incremental decodes
    stop = "### Human:"
    sent, out = 0, []
    reply_ids = []
    for t in ids:
        reply_ids.append(t)
        cur = tok.decode(reply_ids)
        if stop in cur:
            cur = cur[: cur.index(stop)]
            out.append(cur[sent:])
            break
        safe = len(cur)
        for i in range(min(len(stop), len(cur)), 0, -1):
            if cur.endswith(stop[:i]):
                safe = len(cur) - i
                break
        if safe > sent:
            out.append(cur[sent:safe])
            sent = safe
    assert "".join(out) == "yes."
