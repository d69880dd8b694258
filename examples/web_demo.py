"""Streaming web chat demo — the reference's Gradio Colab notebook
(examples/guanaco_7B_demo_colab.ipynb) as a zero-dependency web UI.

Parity surface:
* multi-turn history flattened to ``### Human:/### Assistant:`` turns
  (the notebook's Gradio callback, cell 2);
* token streaming to the browser (TextIteratorStreamer equivalent) over
  Server-Sent Events;
* stop at EOS / the ``### Human:`` stop string (the notebook's
  StoppingCriteria);
* optional conversation logging to a webhook URL after each completed
  turn (the notebook logs conversations the same way).

stdlib only (http.server + a single inline HTML page) — the environment
ships no gradio, and a serving framework isn't needed for one model on
one chip.  Requests are serialized through a lock: one TPU, one decode
stream at a time (use generate/paged.PagedBatcher for real multi-user
serving).

Run:  python examples/web_demo.py --model_path <hf dir> [--adapter_path d]
Demo: python examples/web_demo.py --debug   (random debug model, CPU ok)
"""

import argparse
import json
import os
import sys
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from qlora_tpu.generate import SamplingParams, generate_stream
from qlora_tpu.lora import LoraConfig

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>qlora_tpu chat</title><style>
 body{font-family:system-ui,sans-serif;max-width:44rem;margin:2rem auto;
      padding:0 1rem;background:#fafaf7;color:#1a1a18}
 #log{border:1px solid #ddd;border-radius:8px;background:#fff;
      padding:1rem;min-height:16rem;white-space:pre-wrap}
 .u{color:#355} .b{color:#173} .turn{margin:.5rem 0}
 form{display:flex;gap:.5rem;margin-top:1rem}
 input{flex:1;padding:.5rem;border:1px solid #ccc;border-radius:6px}
 button{padding:.5rem 1rem;border:0;border-radius:6px;background:#246;
        color:#fff;cursor:pointer}
</style></head><body>
<h2>qlora_tpu &mdash; Guanaco chat</h2>
<div id="log"></div>
<form id="f"><input id="m" autocomplete="off" placeholder="Say something…">
<button>Send</button></form>
<script>
const hist = [];   // [user, assistant] turns
const log = document.getElementById('log');
document.getElementById('f').onsubmit = async (e) => {
  e.preventDefault();
  const inp = document.getElementById('m');
  const msg = inp.value.trim();
  if (!msg) return;
  inp.value = '';
  log.insertAdjacentHTML('beforeend',
    `<div class="turn u">you&gt; ${msg.replace(/</g,'&lt;')}</div>`);
  const bot = document.createElement('div');
  bot.className = 'turn b'; bot.textContent = 'bot> ';
  log.appendChild(bot);
  const r = await fetch('/chat', {method:'POST',
    headers:{'Content-Type':'application/json'},
    body: JSON.stringify({history: hist, message: msg})});
  const reader = r.body.getReader();
  const dec = new TextDecoder();
  let reply = '', buf = '';
  for (;;) {
    const {done, value} = await reader.read();
    if (done) break;
    buf += dec.decode(value, {stream:true});
    for (;;) {                      // parse complete SSE events
      const i = buf.indexOf('\\n\\n');
      if (i < 0) break;
      const ev = buf.slice(0, i); buf = buf.slice(i + 2);
      if (ev.startsWith('data: ')) {
        const d = JSON.parse(ev.slice(6));
        if (d.delta !== undefined) { reply += d.delta;
                                     bot.textContent = 'bot> ' + reply; }
      }
    }
    log.scrollTop = log.scrollHeight;
  }
  hist.push([msg, reply]);
};
</script></body></html>"""


def build_prompt(history, message):
    """Flatten turns like the demo notebook's Gradio callback (cell 2)."""
    parts = [f"### Human: {u}### Assistant: {a}" for u, a in history]
    parts.append(f"### Human: {message}### Assistant:")
    return "".join(parts)


class ChatEngine:
    """Model + tokenizer + a lock serializing decode streams."""

    def __init__(self, args):
        if args.debug:
            from qlora_tpu.models import get_config, init_params
            from qlora_tpu.utils.testing import FakeTokenizer

            self.cfg = get_config("debug")
            self.params = init_params(jax.random.PRNGKey(0), self.cfg,
                                      quantized=True)
            self.tokenizer = FakeTokenizer()
        else:
            from qlora_tpu.utils.hf_import import load_hf_model
            from qlora_tpu.utils.tokenizer import load_tokenizer

            self.params, self.cfg = load_hf_model(args.model_path,
                                                  quantize_base=True)
            self.tokenizer, _ = load_tokenizer(args.model_path)
        self.lcfg = LoraConfig()
        self.lora = None
        if args.adapter_path:
            from qlora_tpu.models import init_lora_params
            from qlora_tpu.utils.checkpoint import (get_last_checkpoint,
                                                    load_checkpoint)

            ckpt, _ = get_last_checkpoint(args.adapter_path)
            like = init_lora_params(jax.random.PRNGKey(0), self.cfg, self.lcfg)
            self.lora, _, _ = load_checkpoint(ckpt or args.adapter_path, like)
        self.sparams = SamplingParams(
            do_sample=True, temperature=args.temperature, top_p=args.top_p)
        self.max_new_tokens = args.max_new_tokens
        self.speculative = getattr(args, "speculative", 0)
        self.decode_impl = getattr(args, "decode_impl", None)
        self.decode_params = None
        if self.decode_impl == "int8":
            # serving copy built ONCE, reused across turns
            from qlora_tpu.generate.serve_int8 import (
                requantize_params_int8_unstacked,
            )

            self.decode_params = requantize_params_int8_unstacked(self.params)
        self.lock = threading.Lock()

    def stream_reply(self, history, message):
        """Yield decoded text deltas; stops at EOS or '### Human:'."""
        tok = self.tokenizer
        prompt = build_prompt(history, message)
        ids = [tok.bos_token_id] + tok.encode(prompt)
        stop = "### Human:"
        reply_ids, sent = [], 0
        with self.lock:
            if self.speculative > 0:
                from qlora_tpu.generate import generate_stream_speculative

                stream = generate_stream_speculative(
                    self.params, self.lora, jnp.asarray([ids], jnp.int32),
                    jnp.asarray([len(ids)]), self.cfg, self.lcfg,
                    max_new_tokens=self.max_new_tokens,
                    eos_id=tok.eos_token_id, sparams=self.sparams,
                    draft_len=self.speculative,
                    decode_impl=self.decode_impl,
                    decode_params=self.decode_params,
                )
            else:
                stream = generate_stream(
                    self.params, self.lora, jnp.asarray([ids], jnp.int32),
                    jnp.asarray([len(ids)]), self.cfg, self.lcfg,
                    max_new_tokens=self.max_new_tokens,
                    eos_id=tok.eos_token_id, sparams=self.sparams,
                    decode_impl=self.decode_impl,
                    decode_params=self.decode_params,
                )
            for step in stream:
                t = int(step[0])
                if t == tok.eos_token_id:
                    break
                reply_ids.append(t)
                text = tok.decode(reply_ids)
                if stop in text:                 # notebook StoppingCriteria
                    text = text[: text.index(stop)]
                    yield text[sent:]
                    return
                # hold back a stop-string prefix at the tail so we never
                # stream half of "### Human:" to the browser (longest
                # suffix-of-text == prefix-of-stop match)
                safe = len(text)
                for i in range(min(len(stop), len(text)), 0, -1):
                    if text.endswith(stop[:i]):
                        safe = len(text) - i
                        break
                if safe > sent:
                    yield text[sent:safe]
                    sent = safe


def make_handler(engine, webhook):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):              # quiet access log
            pass

        def do_GET(self):
            body = PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/chat":
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            history = [tuple(t) for t in req.get("history", [])]
            message = req.get("message", "")
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            reply = []
            for delta in engine.stream_reply(history, message):
                reply.append(delta)
                self.wfile.write(
                    f"data: {json.dumps({'delta': delta})}\n\n".encode())
                self.wfile.flush()
            self.wfile.write(b"data: {\"done\": true}\n\n")
            self.wfile.flush()
            if webhook:                          # notebook conversation log
                record = {"history": list(history),
                          "turn": [message, "".join(reply)]}
                try:
                    urllib.request.urlopen(urllib.request.Request(
                        webhook, json.dumps(record).encode(),
                        {"Content-Type": "application/json"}), timeout=5)
                except Exception:                # logging must never 500 chat
                    pass

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--adapter_path", default=None)
    ap.add_argument("--debug", action="store_true",
                    help="random debug model + byte tokenizer (no weights)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7860)   # gradio's default
    ap.add_argument("--max_new_tokens", type=int, default=512)
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--top_p", type=float, default=0.9)
    ap.add_argument("--log_webhook", default=None,
                    help="POST each completed turn as JSON to this URL")
    ap.add_argument("--decode_impl", default=None, choices=[None, "int8"],
                    help="int8: token loop through the direct int8 MXU "
                         "serving kernels (~3x decode at 7B; prefill "
                         "stays bf16-exact)")
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="prompt-lookup speculative decoding with K-token "
                         "drafts (0 = off); sampled outputs stay exactly "
                         "distributed via rejection sampling")
    args = ap.parse_args()
    if not args.debug and not args.model_path:
        ap.error("--model_path required (or --debug)")

    engine = ChatEngine(args)
    srv = ThreadingHTTPServer((args.host, args.port),
                              make_handler(engine, args.log_webhook))
    print(f"chat ui: http://{args.host}:{args.port}/")
    srv.serve_forever()


if __name__ == "__main__":
    main()
