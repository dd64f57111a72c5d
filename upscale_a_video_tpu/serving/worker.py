"""Model worker: registers with the controller, heartbeats, and executes
upscale jobs serially on its TPU (ref llava/serve/model_worker.py — worker
registration + heartbeat thread + generate endpoint, rebuilt for the VSR
pipeline; the streaming response mirrors the reference worker's
``generate_stream`` chunked protocol).

    POST /predict {video_path, ...predict kwargs}            → {output}
    POST /predict {..., "stream": true}  → chunked NDJSON: one
         {"progress": {stage, i, n}} line per pipeline stage tick, then
         {"output": ...} (or {"error": ...}) as the final line
    POST /status → {queue_length}
"""

from __future__ import annotations

import inspect
import json
import queue
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .controller import WORKER_HEART_BEAT_INTERVAL
from .predictor import Predictor


class Worker:
    def __init__(self, name: str, url: str, controller_url: str,
                 predictor: Predictor):
        self.name = name
        self.url = url
        self.controller_url = controller_url
        self.predictor = predictor
        self.jobs: "queue.Queue[tuple]" = queue.Queue()
        self._stop = threading.Event()
        # progress_cb is only passed when the predictor declares it — fakes
        # and older predictors keep working unchanged
        sig = inspect.signature(predictor.predict)
        self._supports_progress = "progress_cb" in sig.parameters

    # --------------------------------------------------- controller protocol

    def _post(self, path: str, payload: dict) -> dict:
        req = urllib.request.Request(
            self.controller_url + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            return json.loads(resp.read())

    def register(self) -> None:
        self._post("/register_worker", {"name": self.name, "url": self.url})

    def heartbeat_loop(self) -> None:
        while not self._stop.is_set():
            try:
                r = self._post("/heartbeat", {
                    "name": self.name, "queue_length": self.jobs.qsize()})
                if not r.get("exist"):
                    self.register()  # controller restarted — re-register
            except Exception:
                pass
            self._stop.wait(WORKER_HEART_BEAT_INTERVAL)

    # ------------------------------------------------------------- job loop

    def job_loop(self) -> None:
        while not self._stop.is_set():
            try:
                kwargs, result_box, done, events = self.jobs.get(timeout=1.0)
            except queue.Empty:
                continue
            if events is not None and self._supports_progress:
                def cb(stage, i, n, _ev=events):
                    _ev.put({"progress": {"stage": stage, "i": i, "n": n}})
                kwargs = dict(kwargs, progress_cb=cb)
            try:
                result_box["output"] = self.predictor.predict(**kwargs)
            except Exception as e:  # job failures don't kill the worker
                result_box["error"] = f"{type(e).__name__}: {e}"
            if events is not None:
                events.put(dict(result_box))
                events.put(None)  # stream terminator
            done.set()

    def submit(self, kwargs: dict, timeout: float = 3600.0) -> dict:
        box: dict = {}
        done = threading.Event()
        self.jobs.put((kwargs, box, done, None))
        done.wait(timeout)
        return box

    def submit_stream(self, kwargs: dict) -> "queue.Queue":
        """Enqueue a job; returns a queue yielding {"progress": ...} events,
        then the final result dict, then None."""
        box: dict = {}
        events: "queue.Queue" = queue.Queue()
        self.jobs.put((kwargs, box, threading.Event(), events))
        return events

    def start(self) -> None:
        try:
            self.register()
        except Exception:
            pass  # controller not up yet — the heartbeat loop re-registers
        threading.Thread(target=self.heartbeat_loop, daemon=True).start()
        threading.Thread(target=self.job_loop, daemon=True).start()

    def stop(self) -> None:
        self._stop.set()


def make_handler(worker: Worker):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # chunked responses need 1.1

        def log_message(self, *args):
            pass

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _chunk(self, data: bytes):
            self.wfile.write(f"{len(data):X}\r\n".encode() + data + b"\r\n")

        def _stream_predict(self, data: dict):
            events = worker.submit_stream(data)
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            while True:
                ev = events.get()
                if ev is None:
                    break
                try:
                    self._chunk(json.dumps(ev).encode() + b"\n")
                    self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    return  # client went away; job still completes
            self.wfile.write(b"0\r\n\r\n")

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                data = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(data, dict):
                    raise ValueError("body must be a JSON object")
            except (ValueError, json.JSONDecodeError) as e:
                self._json(400, {"error": f"bad request body: {e}"})
                return
            if self.path == "/predict":
                if data.pop("stream", False):
                    self._stream_predict(data)
                    return
                result = worker.submit(data)
                self._json(200 if "output" in result else 500, result)
            elif self.path == "/status":
                self._json(200, {"queue_length": worker.jobs.qsize()})
            else:
                self._json(404, {"error": "unknown endpoint"})

    return Handler


def serve_worker(name: str, host: str, port: int, controller_url: str,
                 predictor: Predictor) -> ThreadingHTTPServer:
    worker = Worker(name, "", controller_url, predictor)
    server = ThreadingHTTPServer((host, port), make_handler(worker))
    # bind before advertising so port=0 registers the actual bound port
    worker.url = f"http://{host}:{server.server_address[1]}"
    worker.start()
    server.worker = worker  # type: ignore[attr-defined]
    return server


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="worker-0")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=21002)
    ap.add_argument("--controller", default="http://localhost:21001")
    ap.add_argument("--model_dir", default="./pretrained_models/upscale_a_video")
    ap.add_argument("--random_weights", action="store_true")
    args = ap.parse_args()

    predictor = Predictor()
    predictor.setup(args.model_dir, random_weights=args.random_weights)
    srv = serve_worker(args.name, args.host, args.port, args.controller, predictor)
    print(f"worker {args.name} on {args.host}:{args.port}")
    srv.serve_forever()
