"""HTTP controller/worker serving (ref `llava/serve/controller.py` +
`model_worker.py` — the reference's only distributed-serving surface, used for
its captioner; rebuilt here for the VSR pipeline itself).

stdlib-only (no FastAPI in the image):
- Controller: worker registry with heartbeat expiry (constants mirror
  llava/constants.py:1-2), dispatch to the worker with the shortest queue
  ("shortest_queue") or a speed-weighted lottery ("lottery",
  ref controller.py dispatch methods).
- Worker (worker.py): registers, heartbeats, executes predict jobs serially
  (one TPU pipeline per worker process).

Protocol (JSON over HTTP):
    POST /register_worker   {name, url, speed}
    POST /heartbeat         {name, queue_length}
    POST /list_workers
    POST /get_worker        {}               → {url} | 404
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

CONTROLLER_HEART_BEAT_EXPIRATION = 30  # ref llava/constants.py:1
WORKER_HEART_BEAT_INTERVAL = 15        # ref llava/constants.py:2


@dataclass
class WorkerInfo:
    url: str
    speed: float = 1.0
    queue_length: int = 0
    last_heartbeat: float = field(default_factory=time.time)


class Controller:
    def __init__(self, dispatch_method: str = "shortest_queue"):
        assert dispatch_method in ("shortest_queue", "lottery")
        self.dispatch_method = dispatch_method
        self.workers: Dict[str, WorkerInfo] = {}
        self.lock = threading.Lock()

    def register_worker(self, name: str, url: str, speed: float = 1.0) -> None:
        with self.lock:
            self.workers[name] = WorkerInfo(url=url, speed=speed)

    def heartbeat(self, name: str, queue_length: int) -> bool:
        with self.lock:
            if name not in self.workers:
                return False
            w = self.workers[name]
            w.queue_length = queue_length
            w.last_heartbeat = time.time()
            return True

    def remove_stale_workers(self) -> None:
        now = time.time()
        with self.lock:
            stale = [n for n, w in self.workers.items()
                     if now - w.last_heartbeat > CONTROLLER_HEART_BEAT_EXPIRATION]
            for n in stale:
                del self.workers[n]

    def get_worker(self) -> Optional[str]:
        self.remove_stale_workers()
        with self.lock:
            if not self.workers:
                return None
            if self.dispatch_method == "shortest_queue":
                # queue normalized by speed (ref controller.py shortest-queue)
                name = min(self.workers,
                           key=lambda n: self.workers[n].queue_length
                           / max(self.workers[n].speed, 1e-6))
                self.workers[name].queue_length += 1
                return self.workers[name].url
            # lottery: sample by speed
            names = list(self.workers)
            speeds = np.array([self.workers[n].speed for n in names], dtype=np.float64)
            p = speeds / speeds.sum()
            return self.workers[np.random.choice(names, p=p)].url


def make_handler(controller: Controller):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            data = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/register_worker":
                controller.register_worker(
                    data["name"], data["url"], float(data.get("speed", 1.0)))
                self._json(200, {"ok": True})
            elif self.path == "/heartbeat":
                ok = controller.heartbeat(data["name"], int(data.get("queue_length", 0)))
                self._json(200 if ok else 404, {"ok": ok, "exist": ok})
            elif self.path == "/list_workers":
                controller.remove_stale_workers()
                self._json(200, {
                    n: {"url": w.url, "queue_length": w.queue_length,
                        "speed": w.speed}
                    for n, w in controller.workers.items()
                })
            elif self.path == "/get_worker":
                url = controller.get_worker()
                if url is None:
                    self._json(404, {"error": "no workers"})
                else:
                    self._json(200, {"url": url})
            else:
                self._json(404, {"error": "unknown endpoint"})

    return Handler


def serve_controller(host: str = "0.0.0.0", port: int = 21001,
                     dispatch_method: str = "shortest_queue") -> ThreadingHTTPServer:
    controller = Controller(dispatch_method)
    server = ThreadingHTTPServer((host, port), make_handler(controller))
    server.controller = controller  # type: ignore[attr-defined]
    return server


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=21001)
    ap.add_argument("--dispatch-method", default="shortest_queue")
    args = ap.parse_args()
    srv = serve_controller(args.host, args.port, args.dispatch_method)
    print(f"controller on {args.host}:{args.port}")
    srv.serve_forever()
