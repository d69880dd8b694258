"""OpenAI-compatible HTTP serving on the PagedBatcher engine.

The reference's inference surfaces are single-user (a generate script and
a Gradio notebook, examples/guanaco_generate.py /
examples/guanaco_7B_demo_colab.ipynb).  This server is the production
counterpart the TPU engine was built for: MANY concurrent clients share
one chip through continuous batching — admissions interleave with
decode, each client streams its own tokens as its slot produces them.

API (OpenAI v1 subset, stdlib only — no fastapi/flask in this image):
  POST /v1/completions      {"prompt": str, "max_tokens": int,
                             "stream": bool}  → completion JSON, or SSE
                             chunks ending with `data: [DONE]`
  POST /v1/chat/completions {"messages": [{"role", "content"}, ...],
                             "max_tokens", "stream"} — messages flatten
                             to the Guanaco `### Human:/### Assistant:`
                             template (the reference's chat format,
                             examples/guanaco_7B_demo_colab.ipynb);
                             generation stops at EOS or a `### Human:`
                             stop string (held back from the stream)
  GET  /v1/models           → the single served model

Engine model: ONE background thread owns the PagedBatcher and loops
``step()``; HTTP handlers never touch the engine directly — they enqueue
(prompt, token-queue) pairs and consume their queue.  Sampling is an
ENGINE-level config (--temperature/--top_p apply to every slot; the
batcher samples all slots in one dispatch — per-request sampling params
in the request body are rejected with 400 unless they match), and
speculation (--speculative k) / int8 decode (--decode_impl int8) are the
same serving options bench.py measures.

Run:   python examples/serve_openai.py --model_path <hf dir> --port 8000
Debug: python examples/serve_openai.py --debug --port 8000   (CPU ok)
Try:   curl -N localhost:8000/v1/completions -d \
         '{"prompt": "Hello", "max_tokens": 16, "stream": true}'
"""

import argparse
import json
import os
import queue
import sys
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from qlora_tpu.generate import SamplingParams
from qlora_tpu.lora import LoraConfig


class ServingEngine:
    """Background thread driving a PagedBatcher; thread-safe submit()."""

    def __init__(self, args):
        if args.debug:
            from qlora_tpu.models import get_config, init_params
            from qlora_tpu.utils.testing import FakeTokenizer

            self.cfg = get_config("debug")
            params = init_params(jax.random.PRNGKey(0), self.cfg,
                                 quantized=True)
            self.tokenizer = FakeTokenizer()
            engine_kw = dict(n_pages=64, page_size=8, max_pages_per_seq=8,
                             prefill_buckets=(16, 32))
        else:
            from qlora_tpu.utils.hf_import import load_hf_model
            from qlora_tpu.utils.tokenizer import load_tokenizer

            params, self.cfg = load_hf_model(args.model_path,
                                             quantize_base=True)
            self.tokenizer, _ = load_tokenizer(args.model_path)
            engine_kw = dict(n_pages=args.n_pages, page_size=64,
                             max_pages_per_seq=args.max_pages_per_seq,
                             prefill_buckets=(128, 256, 512))
        lora = None
        if args.adapter_path:
            from qlora_tpu.models import init_lora_params
            from qlora_tpu.utils.checkpoint import (get_last_checkpoint,
                                                    load_checkpoint)

            ckpt, _ = get_last_checkpoint(args.adapter_path)
            like = init_lora_params(jax.random.PRNGKey(0), self.cfg,
                                    LoraConfig())
            lora, _, _ = load_checkpoint(ckpt or args.adapter_path, like)

        from qlora_tpu.generate.paged import PagedBatcher

        self.sparams = SamplingParams(
            do_sample=args.temperature > 0,
            temperature=max(args.temperature, 1e-6), top_p=args.top_p)
        self.model_id = (args.model_path or "debug").rstrip("/").split("/")[-1]
        self.pb = PagedBatcher(
            params, lora, self.cfg, num_slots=args.slots,
            eos_id=self.tokenizer.eos_token_id, sparams=self.sparams,
            decode_impl=args.decode_impl,
            prefill_impl="w8a8" if args.decode_impl == "int8" else None,
            steps_per_dispatch=args.steps_per_dispatch,
            admit_batch=args.admit_batch,
            spec_draft_len=args.speculative,
            # production default: speculation self-disables on traffic
            # where drafts stop paying (rolling tokens/chunk gate)
            spec_adaptive=not getattr(args, "no_spec_adaptive", False),
            **engine_kw,
        )
        self._pending = queue.Queue()   # (prompt_ids, max_tokens, out_q, h)
        self._cancels = queue.Queue()   # handles to stop early
        self._tracked = {}              # req.uid -> (Request, out_q)
        self._wake = threading.Event()
        self._stop = False
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def submit(self, prompt_ids, max_tokens):
        """Thread-safe: returns (handle, queue yielding token ids then None)."""
        out_q = queue.Queue()
        handle = {}
        self._pending.put((prompt_ids, max_tokens, out_q, handle))
        self._wake.set()
        return handle, out_q

    def cancel(self, handle):
        """Thread-safe early stop (e.g. a stop string matched): the engine
        thread marks the request done; its slot retires next step."""
        self._cancels.put(handle)
        self._wake.set()

    def shutdown(self):
        self._stop = True
        self._wake.set()
        self.thread.join(timeout=30)

    def _run(self):
        import traceback

        pb = self.pb
        try:
            while not self._stop:
                # drain submissions into the batcher (engine thread only)
                while True:
                    try:
                        ids, n, out_q, handle = self._pending.get_nowait()
                    except queue.Empty:
                        break
                    req = pb.submit(
                        ids, max_new_tokens=n,
                        on_token=lambda uid, tok, q=out_q: q.put(tok))
                    handle["req"] = req
                    self._tracked[req.uid] = (req, out_q)
                while True:
                    try:
                        h = self._cancels.get_nowait()
                    except queue.Empty:
                        break
                    if "req" in h:
                        h["req"].done = True   # retires next step
                if not (pb.queue or pb.num_active):
                    self._wake.clear()
                    self._wake.wait(timeout=0.2)
                    continue
                pb.step()
                for uid in list(self._tracked):
                    req, out_q = self._tracked[uid]
                    if req.done:
                        del self._tracked[uid]
                        out_q.put(None)   # end-of-stream
        except Exception:  # noqa: BLE001 — surface engine crashes to every
            traceback.print_exc()         # waiting client instead of hanging
            for uid in list(self._tracked):
                self._tracked.pop(uid)[1].put(None)


def make_handler(engine: ServingEngine):
    tok = engine.tokenizer

    def completion_id():
        return "cmpl-" + uuid.uuid4().hex[:24]

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/v1/models":
                self._json(200, {"object": "list", "data": [
                    {"id": engine.model_id, "object": "model",
                     "owned_by": "qlora_tpu"}]})
            else:
                self._json(404, {"error": {"message": "not found"}})

        def do_POST(self):
            chat = self.path == "/v1/chat/completions"
            if self.path != "/v1/completions" and not chat:
                self._json(404, {"error": {"message": "not found"}})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
            except Exception:  # noqa: BLE001
                self._json(400, {"error": {"message": "bad JSON"}})
                return
            stop = None
            if chat:
                # Guanaco template (the reference's chat format); the
                # `### Human:` stop string ends the assistant turn
                parts = []
                for m in body.get("messages", []):
                    role, content = m.get("role"), m.get("content", "")
                    if role == "system":
                        parts.append(content + "\n")
                    elif role == "assistant":
                        parts.append(f"### Assistant: {content}\n")
                    else:
                        parts.append(f"### Human: {content}\n")
                prompt = "".join(parts) + "### Assistant:"
                stop = "### Human:"
            else:
                prompt = body.get("prompt", "")
                if isinstance(prompt, list):
                    prompt = prompt[0] if prompt else ""
            max_tokens = min(int(body.get("max_tokens", 64)), 2048)
            # engine-level sampling: reject mismatched per-request params
            # rather than silently ignoring them
            for k, have in (("temperature", engine.sparams.temperature),
                            ("top_p", engine.sparams.top_p)):
                want = body.get(k)
                if want is not None and abs(float(want) - have) > 1e-6:
                    self._json(400, {"error": {"message":
                        f"{k} is an engine-level setting on this server "
                        f"(engine {k}={have}); restart with --{k}"}})
                    return
            stream = bool(body.get("stream", False))
            ids = tok.encode(prompt)
            handle, out_q = engine.submit(list(ids), max_tokens)
            cid = ("chatcmpl-" if chat else "cmpl-") + uuid.uuid4().hex[:24]
            created = int(time.time())
            obj = "chat.completion" if chat else "text_completion"

            def payload(delta, fin):
                if chat:
                    if stream:
                        c = {"index": 0, "delta":
                             ({"content": delta} if delta else {}),
                             "finish_reason": fin}
                    else:
                        c = {"index": 0, "message":
                             {"role": "assistant", "content": delta},
                             "finish_reason": fin}
                else:
                    c = {"index": 0, "text": delta, "finish_reason": fin}
                o = obj + (".chunk" if (chat and stream) else "")
                return {"id": cid, "object": o, "created": created,
                        "model": engine.model_id, "choices": [c]}

            if not stream:
                toks = []
                stopped = False
                text = ""
                while True:
                    t = out_q.get()
                    if t is None:
                        break
                    toks.append(t)
                    if stop:
                        text = tok.decode(toks)
                        hit = text.find(stop)
                        if hit >= 0:
                            text = text[:hit]
                            stopped = True
                            engine.cancel(handle)
                            # drain to end-of-stream
                            while out_q.get() is not None:
                                pass
                            break
                if not stopped:
                    text = tok.decode(toks)
                out = payload(text.rstrip() if chat else text, "stop")
                out["usage"] = {"prompt_tokens": len(ids),
                                "completion_tokens": len(toks),
                                "total_tokens": len(ids) + len(toks)}
                self._json(200, out)
                return

            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def sse(obj_):
                data = b"data: " + json.dumps(obj_).encode() + b"\n\n"
                self.wfile.write(b"%x\r\n%s\r\n" % (len(data), data))
                self.wfile.flush()

            # decode incrementally: flush text deltas (local state — the
            # handler instance persists across keep-alive requests).  With
            # a stop string, hold back any tail that could be its prefix
            # so clients never see a partial "### Human:".
            emitted = []
            sent = ""
            while True:
                t = out_q.get()
                if t is None:
                    break
                emitted.append(t)
                text = tok.decode(emitted)
                if stop:
                    hit = text.find(stop)
                    if hit >= 0:
                        final = text[:hit]
                        if len(final) > len(sent):
                            sse(payload(final[len(sent):], None))
                            sent = final
                        engine.cancel(handle)
                        while out_q.get() is not None:
                            pass
                        break
                    safe = len(text)
                    for j in range(max(len(text) - len(stop) + 1, 0),
                                   len(text)):
                        if stop.startswith(text[j:]):
                            safe = j
                            break
                    text = text[:safe]
                if len(text) <= len(sent):
                    continue   # partial multi-byte sequence; wait for more
                sse(payload(text[len(sent):], None))
                sent = text
            sse(payload("", "stop"))
            data = b"data: [DONE]\n\n"
            self.wfile.write(b"%x\r\n%s\r\n" % (len(data), data))
            self.wfile.write(b"0\r\n\r\n")
            self.wfile.flush()

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser("serve_openai")
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--adapter_path", default=None)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--n_pages", type=int, default=288)
    ap.add_argument("--max_pages_per_seq", type=int, default=12)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top_p", type=float, default=1.0)
    ap.add_argument("--decode_impl", default=None, choices=(None, "int8"))
    ap.add_argument("--speculative", type=int, default=0)
    ap.add_argument("--no_spec_adaptive", action="store_true",
                    help="always speculate (skip the acceptance gate)")
    ap.add_argument("--steps_per_dispatch", type=int, default=16)
    ap.add_argument("--admit_batch", type=int, default=4)
    args = ap.parse_args(argv)
    if not args.debug and not args.model_path:
        ap.error("pass --model_path or --debug")

    engine = ServingEngine(args)
    srv = ThreadingHTTPServer((args.host, args.port), make_handler(engine))
    print(f"serving {engine.model_id} on http://{args.host}:{args.port} "
          f"({args.slots} slots, spec={args.speculative}, "
          f"decode_impl={args.decode_impl})", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
