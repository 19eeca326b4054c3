"""Minimal HTTP serving front-end over the continuous-batching scheduler.

Stdlib-only (http.server + threads). POST /v1/completions with
{"prompt": ..., "max_tokens": N, "temperature"/"top_k"/"top_p"/
"repetition_penalty"/"seed": ..., "stop": [...], "stream": bool}:

  * stream=false (default): returns {"text": ...} once the request
    completes; text honors stop strings exactly like LLM.__call__.
  * stream=true: Server-Sent Events — one `data: {"text": chunk}` event
    per safe-to-emit text chunk (UTF-8 assembly + stop holdback shared
    with LLM._stream via utils.TextStreamer), then `data: [DONE]`.
    A client disconnect cancels the request at the scheduler's next host
    checkpoint.

GET /health reports scheduler state. Requests are admitted mid-flight into
the shared batch (serving/scheduler.py) — concurrent clients share one
forward pass per step.

No reference counterpart (the reference is a library only); this is the
deployment-shaped surface over the same engine.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .scheduler import BatchScheduler, Request


class ServingLoop:
    """Background thread driving scheduler.step(); completion events per
    request uid; optional per-request text-chunk queues for streaming."""

    def __init__(self, llm, batch_slots: int = 8, mesh=None):
        self.llm = llm
        b = llm._bundle
        # honor the same KV-dtype knob as the LLM's own engine (int8
        # matters MOST here: the shared batch multiplies cache HBM)
        self.scheduler = BatchScheduler(
            b.spec,
            llm._engine.params,
            batch_slots=batch_slots,
            kv_dtype=llm._engine.kv_dtype,
            mesh=mesh,
            detokenize=lambda ts: llm.detokenize(ts, decode=False),
        )
        self._events = {}
        self._queues = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        import time

        while not self._stop.is_set():
            with self._lock:
                busy = bool(self.scheduler.active or self.scheduler.waiting)
                done = self.scheduler.step() if busy else []
            for uid in done:
                self._signal_done(uid)
            if not busy:
                time.sleep(0.005)

    def _signal_done(self, uid: int) -> None:
        ev = self._events.pop(uid, None)
        if ev is not None:
            ev.set()
        q = self._queues.pop(uid, None)
        if q is not None:
            q.put(None)  # end-of-stream sentinel

    def submit_and_wait(self, request: Request, timeout: float = 600.0):
        ev = threading.Event()
        with self._lock:
            uid = self.scheduler.submit(request)
            self._events[uid] = ev
        if not ev.wait(timeout):
            raise TimeoutError("generation timed out")
        return self.scheduler.finished[uid]

    def submit_stream(self, request: Request):
        """Submit with streaming: returns (uid, queue) where the queue
        yields text chunks and a final None sentinel."""
        q: "queue.Queue[Optional[str]]" = queue.Queue()
        request.on_text = q.put
        with self._lock:
            uid = self.scheduler.submit(request)
            self._queues[uid] = q
        return uid, q

    def cancel(self, uid: int) -> bool:
        """Abort a request; streaming consumers get their end sentinel.
        Active sequences stop at the scheduler's next host checkpoint."""
        with self._lock:
            hit = self.scheduler.cancel(uid)
            # a waiting request is finished immediately by cancel();
            # signal so submit_and_wait / stream readers unblock
            if uid in self.scheduler.finished:
                self._signal_done(uid)
        return hit

    def shutdown(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)


def make_server(llm, host: str = "127.0.0.1", port: int = 0,
                batch_slots: int = 8, mesh=None) -> ThreadingHTTPServer:
    """Create (not start) the HTTP server; `server.serve_forever()` runs it.
    Port 0 picks a free port (server.server_address reports it)."""
    loop = ServingLoop(llm, batch_slots=batch_slots, mesh=mesh)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                sched = loop.scheduler
                self._json(200, {
                    "status": "ok",
                    "active": len(sched.active),
                    "waiting": len(sched.waiting),
                    "slots": sched.slots,
                })
            else:
                self._json(404, {"error": "not found"})

        def _build_request(self, payload) -> Request:
            cfg = loop.llm.config
            stop = payload.get("stop")
            if isinstance(stop, str):
                stop = [stop]
            return Request(
                tokens=loop.llm.tokenize(payload["prompt"]),
                max_new_tokens=int(
                    payload.get("max_tokens", cfg.max_new_tokens)
                ),
                top_k=int(payload.get("top_k", cfg.top_k)),
                top_p=float(payload.get("top_p", cfg.top_p)),
                temperature=float(
                    payload.get("temperature", cfg.temperature)
                ),
                repetition_penalty=float(
                    payload.get(
                        "repetition_penalty", cfg.repetition_penalty
                    )
                ),
                seed=int(payload.get("seed", cfg.seed)),
                eos_token_id=loop.llm.eos_token_id,
                sampler="llama"
                if loop.llm._bundle.sampler == "llama"
                else "gpt",
                stop=stop,
            )

        def _stream_response(self, req: Request) -> None:
            uid, q = loop.submit_stream(req)
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            try:
                while True:
                    chunk = q.get()
                    if chunk is None:
                        self.wfile.write(b"data: [DONE]\n\n")
                        self.wfile.flush()
                        return
                    body = json.dumps({"text": chunk}).encode("utf-8")
                    self.wfile.write(b"data: " + body + b"\n\n")
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                loop.cancel(uid)  # client went away: stop generating

        def do_POST(self):
            if self.path not in ("/v1/completions", "/generate"):
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                req = self._build_request(payload)
                if payload.get("stream"):
                    self._stream_response(req)
                    return
                seq = loop.submit_and_wait(req)
                # stop strings make Sequence.text authoritative (it is
                # truncated exactly at the match); otherwise detokenize
                text = (
                    seq.text if seq._streamer is not None
                    else loop.llm.detokenize(seq.generated)
                )
                self._json(200, {
                    "text": text,
                    "tokens": seq.generated,
                    "prompt_tokens": seq.prompt_len,
                })
            except Exception as e:  # noqa: BLE001
                self._json(400, {"error": str(e)})

    server = ThreadingHTTPServer((host, port), Handler)
    server.serving_loop = loop  # keep a handle for shutdown
    return server
