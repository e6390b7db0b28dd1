"""Minimal HTTP serving front-end over the continuous-batching server.

Stdlib-only (http.server): no web-framework dependency, suitable for the
zero-egress TPU VM image. One worker thread owns all jax dispatch (the
OnlineHandle loop); HTTP handler threads only do host work — video frame
loading, the processor, JSON — and block on futures/queues.

The reference has no serving layer at all (its eval runner is the closest
thing, retake/infer_eval.py); this is a TPU-native extension on top of
runtime/serve.ContinuousServer.

Endpoints:
  GET  /healthz            -> {"ok": true, ...}
  POST /v1/generate        -> body JSON:
    {"question": str,              # required
     "video_path": str,            # server-local video file OR frame dir
     "max_new_tokens": int?,       # per-request budget (server default)
     "extraction_fps": float?,     # frame-dir extraction fps (default 25)
     "stream": bool?}              # SSE streaming (default false)

  stream=false -> {"tokens": [...], "text": str, "ttft_s": float,
                   "latency_s": float, "cancelled": bool}
  stream=true  -> text/event-stream; one `data: {"tokens": [...],
                  "text_delta": str}` event per harvested segment, then
                  `data: {"done": true, "ttft_s": ..., "latency_s": ...}`.
                  A dropped connection cancels the request server-side
                  (the on_tokens-returns-False contract of serve.run).
"""

from __future__ import annotations

import json
import queue as queue_lib
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from retake_tpu.runtime.serve import ContinuousServer


class RetakeHTTPServer:
    """serve_http(...) -- see module docstring. ``start()`` returns once
    the socket is bound; ``shutdown()`` stops HTTP, then drains and joins
    the serving loop."""

    def __init__(
        self,
        engine,
        processor,
        rt,
        host: str = "127.0.0.1",
        port: int = 8000,
        max_queue: Optional[int] = None,  # submit backlog bound (503 past it)
        **server_kwargs,
    ):
        self.max_queue = max_queue
        self.engine = engine
        self.processor = processor
        self.rt = rt
        self.server = ContinuousServer(engine, **server_kwargs)
        self.handle = None
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._http_thread: Optional[threading.Thread] = None
        self.host, self.port = host, port

    def start(self):
        import time

        self._t_start = time.time()
        # bind the socket BEFORE starting the serving worker: a bind
        # failure (port in use) then raises cleanly with nothing to leak
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # quiet request logging (stderr noise per request otherwise)
            def log_message(self, fmt, *args):
                pass

            def do_GET(self):
                if self.path == "/healthz":
                    body = json.dumps({
                        "ok": True,
                        "batch_slots": outer.server.b,
                        "max_new_tokens": outer.server.max_new,
                    }).encode()
                elif self.path == "/metrics":
                    # counters are written only by the serving-loop thread;
                    # this read is a consistent-enough snapshot (ints)
                    body = json.dumps(dict(
                        outer.server.stats,
                        vision_cache_entries=len(outer.server._vision_cache),
                        prefix_cache_entries=len(
                            getattr(outer.server, "_prefix_cache", ())),
                        uptime_s=round(
                            __import__("time").time() - outer._t_start, 1),
                    )).encode()
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/v1/generate":
                    self.send_error(404)
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    req = outer._build_request(body)
                except Exception as e:  # bad input: report, don't crash
                    msg = json.dumps({"error": str(e)}).encode()
                    self.send_response(400)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(msg)))
                    self.end_headers()
                    self.wfile.write(msg)
                    return
                import queue as _queue

                try:
                    if body.get("stream"):
                        outer._stream(self, req)
                        return
                    res = outer.handle.submit(req).result()
                except _queue.Full:  # backlog at max_queue: backpressure
                    msg = json.dumps({"error": "server overloaded"}).encode()
                    self.send_response(503)
                    self.send_header("Retry-After", "1")
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(msg)))
                    self.end_headers()
                    self.wfile.write(msg)
                    return
                out = json.dumps(outer._result_json(res)).encode()
                self.send_response(500 if res.error else 200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]  # resolve port 0
        self.handle = self.server.start_online(max_queue=self.max_queue)
        self._http_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._http_thread.start()
        return self

    def _build_request(self, body: dict) -> dict:
        from retake_tpu.data.video import fetch_video

        question = body["question"]
        req: dict = {}
        path = body.get("video_path")
        # cache key includes every per-request frame-loading knob: the same
        # file at a different extraction_fps is a DIFFERENT frame set (and
        # token count) and must not hit the other's features
        fps = float(body.get("extraction_fps", 25.0))
        cache_key = f"{path}|fps={fps}"
        cache_on = (self.server.vision_cache_slots > 0
                    or getattr(self.server, "prefix_cache_slots", 0) > 0)
        feats = None
        if path and self.server.vision_cache_slots > 0:
            # peek the worker's vision cache: a hit skips BOTH the host
            # frame loading (glacial on this 1-core host) and the device
            # re-encode. The reference (grabbed here) is a strong ref, so
            # a concurrent eviction cannot strand the request.
            feats = self.server._vision_cache.get(cache_key)
        if feats is None and path and getattr(
                self.server, "prefix_cache_slots", 0) > 0:
            # a cached VideoPrefix also carries the features (its mismatch
            # fallback) — frame loading can be skipped on a prefix hit too.
            # Same cross-thread contract as the vision-cache peek above: the
            # worker thread mutates _prefix_cache only via atomic dict ops
            # (pop/reinsert LRU bumps, insert, evict), each atomic under the
            # GIL, so a handler-thread .get() sees either a complete entry
            # or a miss (worst case: a spurious miss during a bump → the
            # request just reloads frames); the grabbed reference is strong,
            # so a concurrent eviction cannot strand this request's feats.
            vp = self.server._prefix_cache.get(cache_key)
            if vp is not None:
                feats = vp.features
        if feats is not None:
            if feats.grid is not None:  # Qwen2-VL family
                inputs = self.processor(question, video_grid=feats.grid)
            else:  # LLaVA family
                inputs = self.processor(question, num_frames=feats.t)
            req = {k: v for k, v in inputs.items() if v is not None}
            req["video_features"] = feats
            req["video_key"] = cache_key  # LRU bump at admission
        elif path:
            frames = fetch_video(
                path,
                self.rt.max_num_frames,
                self.rt.sample_fps,
                self.rt.longsize_resolution,
                extraction_fps=fps,
            )
            inputs = self.processor(question, frames)
            req = {k: v for k, v in inputs.items() if v is not None}
            if cache_on:
                req["video_key"] = cache_key
        else:
            inputs = self.processor(question)
            req = {k: v for k, v in inputs.items() if v is not None}
        if body.get("max_new_tokens") is not None:
            req["max_new_tokens"] = int(body["max_new_tokens"])
        if body.get("deadline_s") is not None:
            # explicit None-check: deadline_s=0 means "already expired,
            # reject without a prefill" and must not be dropped as falsy
            req["deadline_s"] = float(body["deadline_s"])
        return req

    def _result_json(self, res) -> dict:
        return {
            "tokens": [int(t) for t in res.tokens],
            "text": self.processor.decode(res.tokens),
            "ttft_s": round(res.first_token_s - res.arrival_s, 3),
            "latency_s": round(res.finish_s - res.arrival_s, 3),
            "cancelled": bool(res.cancelled),
            **({"error": res.error} if res.error else {}),
        }

    def _stream(self, handler, req):
        """SSE: the worker's on_tokens pushes chunks into a queue; this
        handler thread writes them out. A failed write flips ``dead`` and
        the next on_tokens call returns False -> server-side cancel."""
        chunks: "queue_lib.Queue" = queue_lib.Queue()
        dead = threading.Event()

        def on_tokens(rid, toks):
            chunks.put(list(toks))
            if dead.is_set():
                return False

        fut = self.handle.submit(req, on_tokens=on_tokens)
        fut.add_done_callback(lambda f: chunks.put(None))
        handler.send_response(200)
        handler.send_header("Content-Type", "text/event-stream")
        handler.send_header("Cache-Control", "no-cache")
        handler.end_headers()
        while True:
            item = chunks.get()
            if item is None:
                break
            try:
                handler.wfile.write(
                    b"data: " + json.dumps({
                        "tokens": item,
                        "text_delta": self.processor.decode(item),
                    }).encode() + b"\n\n"
                )
                handler.wfile.flush()
            except (BrokenPipeError, ConnectionResetError, OSError):
                dead.set()  # cancel at the next harvest
        res = fut.result()
        try:
            handler.wfile.write(
                b"data: " + json.dumps(
                    {"done": True, **self._result_json(res)}
                ).encode() + b"\n\n"
            )
            handler.wfile.flush()
        except (BrokenPipeError, ConnectionResetError, OSError):
            pass

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._http_thread.join()
            self._httpd.server_close()
            self._httpd = None
        if self.handle is not None:
            self.handle.close()
            self.handle = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.shutdown()
