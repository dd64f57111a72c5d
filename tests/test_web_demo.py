"""Web demo server (ref llava/serve/gradio_web_server.py analog): page serve,
controller-backed model listing, upscale dispatch through controller→worker,
file serving restrictions, and the caption proxy."""

import base64
import json
import os
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from upscale_a_video_tpu.serving.controller import serve_controller
from upscale_a_video_tpu.serving.web_demo import serve_web_demo


def _post(url, payload, timeout=10):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


class _StubWorkerHandler(BaseHTTPRequestHandler):
    """Pretends to be a model worker: /predict writes a tiny 'mp4'."""

    def log_message(self, *args):
        pass

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        data = json.loads(self.rfile.read(n) or b"{}")
        if self.path == "/predict":
            out_dir = data["output_path"]
            os.makedirs(out_dir, exist_ok=True)
            out = os.path.join(out_dir, "result.mp4")
            with open(out, "wb") as f:
                f.write(b"FAKEMP4" + json.dumps(data, sort_keys=True).encode())
            body = json.dumps({"output": out}).encode()
        else:
            body = json.dumps({"error": "?"}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def stack(tmp_path):
    ctrl = serve_controller("127.0.0.1", 0)
    ctrl_url = f"http://127.0.0.1:{ctrl.server_address[1]}"
    worker = ThreadingHTTPServer(("127.0.0.1", 0), _StubWorkerHandler)
    worker_url = f"http://127.0.0.1:{worker.server_address[1]}"
    demo = serve_web_demo("127.0.0.1", 0, ctrl_url,
                          work_dir=str(tmp_path / "work"))
    demo_url = f"http://127.0.0.1:{demo.server_address[1]}"
    threads = [threading.Thread(target=s.serve_forever, daemon=True)
               for s in (ctrl, worker, demo)]
    for t in threads:
        t.start()
    ctrl.controller.register_worker("w0", worker_url)
    yield demo_url, ctrl_url, demo
    for s in (ctrl, worker, demo):
        s.shutdown()


def test_page_and_model_list(stack):
    demo_url, _, _ = stack
    with urllib.request.urlopen(demo_url + "/", timeout=10) as resp:
        page = resp.read().decode()
    assert "Upscale-A-Video" in page and "noise" in page.lower()
    code, models = _post(demo_url + "/list_models", {})
    assert code == 200 and "w0" in models


def test_upscale_roundtrip_and_file_serving(stack, tmp_path):
    demo_url, _, demo = stack
    payload = {
        "video_b64": base64.b64encode(b"INPUTVIDEO").decode(),
        "filename": "clip.mp4",
        "noise_level": 120, "guidance_scale": 9,
        "inference_steps": 5, "propagation_steps": "2,4",
        "color_fix": "AdaIn",
    }
    code, result = _post(demo_url + "/upscale", payload)
    assert code == 200 and "output" in result

    with open(result["output"], "rb") as f:
        recorded = json.loads(f.read()[7:])
    assert recorded["noise_level"] == 120
    assert recorded["propagation_steps"] == [2, 4]
    assert recorded["color_fix"] == "AdaIn"
    # upload landed in the demo work dir and was forwarded by path
    with open(recorded["video_path"], "rb") as f:
        assert f.read() == b"INPUTVIDEO"

    # /file serves the produced output…
    q = urllib.parse.quote(result["output"])
    with urllib.request.urlopen(f"{demo_url}/file?path={q}", timeout=10) as r:
        assert r.read().startswith(b"FAKEMP4")
    # …but refuses paths outside the work dir
    outside = tmp_path / "secret.txt"
    outside.write_text("x")
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(
            f"{demo_url}/file?path={urllib.parse.quote(str(outside))}",
            timeout=10)

    # a JSONL job log was appended (ref per-day conversation logs)
    logs = [p for p in os.listdir(demo.demo.log_dir) if p.endswith(".jsonl")]
    assert logs

    # the job registry reports the finished job (polling progress)
    assert "job_id" in result
    with urllib.request.urlopen(demo_url + "/jobs", timeout=10) as r:
        jobs = json.loads(r.read())["jobs"]
    mine = [j for j in jobs if j["id"] == result["job_id"]]
    assert mine and mine[0]["status"] == "done"


def test_upscale_errors_without_workers(tmp_path):
    ctrl = serve_controller("127.0.0.1", 0)
    ctrl_url = f"http://127.0.0.1:{ctrl.server_address[1]}"
    demo = serve_web_demo("127.0.0.1", 0, ctrl_url,
                          work_dir=str(tmp_path / "w"))
    demo_url = f"http://127.0.0.1:{demo.server_address[1]}"
    for s in (ctrl, demo):
        threading.Thread(target=s.serve_forever, daemon=True).start()
    try:
        payload = {"video_b64": base64.b64encode(b"x").decode()}
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(demo_url + "/upscale", payload)
        assert ei.value.code == 500
    finally:
        ctrl.shutdown()
        demo.shutdown()



def test_upscale_rejects_paths_outside_work_dir(stack, tmp_path):
    """Server-side video_path is restricted to the demo work dir — any
    worker-readable file must NOT be usable as pipeline input."""
    demo_url, _, _ = stack
    outside = tmp_path / "private.mp4"
    outside.write_bytes(b"SECRET")
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(demo_url + "/upscale", {"video_path": str(outside)})
    assert ei.value.code == 500
    assert "work dir" in json.loads(ei.value.read())["error"]


def test_malformed_json_returns_400(stack):
    demo_url, _, _ = stack
    req = urllib.request.Request(
        demo_url + "/upscale", data=b"{not json",
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400
    assert "bad request body" in json.loads(ei.value.read())["error"]


def test_streaming_upscale_via_real_worker(tmp_path):
    """demo /upscale {"stream": true} forwards the worker's chunked NDJSON
    progress lines and finishes with the result (replaces polling)."""
    from upscale_a_video_tpu.serving.worker import serve_worker

    class StreamingPredictor:
        def predict(self, video_path=None, output_path=None, progress_cb=None,
                    **kwargs):
            os.makedirs(output_path, exist_ok=True)
            out = os.path.join(output_path, "result.mp4")
            with open(out, "wb") as f:
                f.write(b"FAKEMP4")
            if progress_cb is not None:
                progress_cb("denoise", 1, 2)
                progress_cb("denoise", 2, 2)
                progress_cb("decode", 1, 1)
            return out

    ctrl = serve_controller("127.0.0.1", 0)
    ctrl_url = f"http://127.0.0.1:{ctrl.server_address[1]}"
    threading.Thread(target=ctrl.serve_forever, daemon=True).start()
    wsrv = serve_worker("w-s", "127.0.0.1", 0, ctrl_url, StreamingPredictor())
    demo = serve_web_demo("127.0.0.1", 0, ctrl_url,
                          work_dir=str(tmp_path / "work"))
    demo_url = f"http://127.0.0.1:{demo.server_address[1]}"
    for s in (wsrv, demo):
        threading.Thread(target=s.serve_forever, daemon=True).start()
    try:
        payload = {"stream": True,
                   "video_b64": base64.b64encode(b"VID").decode(),
                   "filename": "c.mp4", "inference_steps": 2}
        req = urllib.request.Request(
            demo_url + "/upscale", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=15) as resp:
            assert resp.headers["Content-Type"] == "application/x-ndjson"
            events = [json.loads(l) for l in resp if l.strip()]
        progress = [e["progress"] for e in events if "progress" in e]
        assert progress == [
            {"stage": "denoise", "i": 1, "n": 2},
            {"stage": "denoise", "i": 2, "n": 2},
            {"stage": "decode", "i": 1, "n": 1},
        ]
        final = events[-1]
        assert "output" in final and "job_id" in final
        # the registry recorded live progress and the final state
        with urllib.request.urlopen(demo_url + "/jobs", timeout=10) as r:
            jobs = json.loads(r.read())["jobs"]
        mine = [j for j in jobs if j["id"] == final["job_id"]][0]
        assert mine["status"] == "done"
        assert mine.get("progress") == {"stage": "decode", "i": 1, "n": 1}
    finally:
        wsrv.worker.stop()
        for s in (ctrl, wsrv, demo):
            s.shutdown()
