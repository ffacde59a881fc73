"""Stdlib HTTP front end for :class:`CaptionService`.

Endpoints (JSON in/out):

- ``POST /caption`` — body ``{"visual": [[...], ...], "audio": [[...], ...]?,
  "model": "name"?, "priority": 0?, "deadline_ms": N?}``
  (``[T, D]`` row lists; audio optional for video-only traffic; ``model``
  routes when the server wraps a CaptionRouter; priority/deadline feed the
  service's overload policy — shed requests answer 503, expired deadlines
  504).  Replies ``{"caption": "...", "latency_ms": N}``.
- ``POST /caption_batch`` — body ``{"items": [<same as /caption>, ...]}``;
  all items are submitted before any result is awaited, so a client-side
  batch rides one (or few) device batches.  Replies ``{"captions": [...]}``.
- ``GET /stats`` — the service counters/percentiles.
- ``GET /healthz`` — 200 ``{"ok": true}`` once the service is up.

``ThreadingHTTPServer`` gives one handler thread per connection; concurrent
requests therefore coalesce inside the service's batching window — the
continuous-batching path is exercised by plain parallel HTTP clients, no
custom protocol needed.  Zero third-party dependencies by design (this
container is zero-egress; SURVEY.md's serve path, §3.5, is notebook-only).
"""

from __future__ import annotations

import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np


def _parse_item(item: dict) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    if not isinstance(item, dict) or "visual" not in item:
        raise ValueError("body must be a JSON object with a 'visual' field")
    visual = np.asarray(item["visual"], dtype=np.float32)
    audio = item.get("audio")
    if audio is not None:
        audio = np.asarray(audio, dtype=np.float32)
    return visual, audio


def make_http_server(service, host: str = "127.0.0.1", port: int = 8000) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``.serve_forever()`` to run.

    ``service`` is a CaptionService or a CaptionRouter (multi-model: request
    bodies pick the model with ``"model"``).  Port 0 binds an ephemeral port
    (``server.server_address[1]`` has it) — used by tests/test_serving.py.
    """
    from mvc_tpu.serving.router import CaptionRouter
    from mvc_tpu.serving.service import DeadlineExceeded, ServiceOverloaded

    routed = isinstance(service, CaptionRouter)

    def _submit_kwargs(body: dict) -> dict:
        kw = {}
        if routed:
            kw["model"] = body.get("model")
        elif body.get("model") not in (None, ""):
            raise ValueError("this server hosts a single model; no 'model' routing")
        if body.get("priority") is not None:
            kw["priority"] = int(body["priority"])
        if body.get("deadline_ms") is not None:
            kw["deadline_ms"] = float(body["deadline_ms"])
        return kw

    class Handler(BaseHTTPRequestHandler):
        # quiet by default: per-request stderr lines are useless at qps
        def log_message(self, fmt, *args):  # noqa: D401
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_json(self) -> dict:
            length = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(length) or b"{}")

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/stats":
                self._reply(200, service.stats())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            try:
                body = self._read_json()
            except (ValueError, json.JSONDecodeError) as e:
                return self._reply(400, {"error": f"bad JSON: {e}"})
            try:
                if self.path == "/caption":
                    t0 = time.perf_counter()
                    visual, audio = _parse_item(body)
                    caption = service.submit(visual, audio,
                                             **_submit_kwargs(body)).result()
                    self._reply(200, {
                        "caption": caption,
                        "latency_ms": 1e3 * (time.perf_counter() - t0),
                    })
                elif self.path == "/caption_batch":
                    items = body.get("items")
                    if not isinstance(items, list) or not items:
                        raise ValueError("'items' must be a non-empty list")
                    parsed = [_parse_item(it) for it in items]
                    kw = _submit_kwargs(body)
                    # submit everything before awaiting anything: the whole
                    # client batch lands inside one batching window
                    futures = [service.submit(v, a, **kw) for v, a in parsed]
                    self._reply(200, {"captions": [f.result() for f in futures]})
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})
            except ServiceOverloaded as e:
                self._reply(503, {"error": str(e)})
            except KeyError as e:
                self._reply(404, {"error": str(e)})
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except DeadlineExceeded as e:
                self._reply(504, {"error": str(e)})
            except Exception as e:  # model/device failure -> 500, keep serving
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)
