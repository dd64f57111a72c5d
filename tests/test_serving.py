"""Controller/worker serving: registry, heartbeat expiry, shortest-queue
dispatch, and job routing — without any model (a fake predictor)."""

import json
import threading
import time
import urllib.request

import pytest

from upscale_a_video_tpu.serving import controller as ctrl_mod
from upscale_a_video_tpu.serving.controller import Controller, serve_controller
from upscale_a_video_tpu.serving.worker import Worker, serve_worker


class TestControllerLogic:
    def test_register_and_dispatch(self):
        c = Controller()
        c.register_worker("a", "http://a", 1.0)
        c.register_worker("b", "http://b", 1.0)
        c.workers["a"].queue_length = 5
        c.workers["b"].queue_length = 1
        assert c.get_worker() == "http://b"
        # dispatch bumped b's queue
        assert c.workers["b"].queue_length == 2

    def test_heartbeat_expiry(self):
        c = Controller()
        c.register_worker("a", "http://a")
        c.workers["a"].last_heartbeat = time.time() - 100
        assert c.get_worker() is None

    def test_heartbeat_unknown_worker(self):
        c = Controller()
        assert not c.heartbeat("ghost", 0)

    def test_speed_weighting(self):
        c = Controller()
        c.register_worker("slow", "http://slow", speed=1.0)
        c.register_worker("fast", "http://fast", speed=10.0)
        c.workers["slow"].queue_length = 2
        c.workers["fast"].queue_length = 10
        # 10/10 < 2/1 → fast wins despite longer queue
        assert c.get_worker() == "http://fast"


class FakePredictor:
    def predict(self, **kwargs):
        return f"done:{kwargs.get('video_path')}"


class TestHTTPRoundtrip:
    @pytest.fixture()
    def controller_server(self):
        srv = serve_controller("127.0.0.1", 0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    def _post(self, url, payload):
        req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=5) as resp:
            return json.loads(resp.read())

    def test_worker_registration_flow(self, controller_server):
        srv, url = controller_server
        worker = Worker("w0", "http://127.0.0.1:9999", url, FakePredictor())
        worker.register()
        workers = self._post(url + "/list_workers", {})
        assert "w0" in workers
        got = self._post(url + "/get_worker", {})
        assert got["url"] == "http://127.0.0.1:9999"

    def test_worker_job_execution(self, controller_server):
        _, url = controller_server
        worker = Worker("w1", "http://127.0.0.1:9998", url, FakePredictor())
        worker.start()
        try:
            result = worker.submit({"video_path": "clip.mp4"}, timeout=10)
            assert result.get("output") == "done:clip.mp4"
        finally:
            worker.stop()


class ProgressFakePredictor:
    """Declares progress_cb so the worker wires the streaming callback."""

    def predict(self, video_path=None, progress_cb=None, **kwargs):
        if progress_cb is not None:
            for i in range(1, 4):
                progress_cb("denoise", i, 3)
            progress_cb("decode", 1, 1)
        return f"done:{video_path}"


class TestStreamingPredict:
    def test_streaming_http_roundtrip(self):
        ctrl = serve_controller("127.0.0.1", 0)
        ctrl_url = f"http://127.0.0.1:{ctrl.server_address[1]}"
        threading.Thread(target=ctrl.serve_forever, daemon=True).start()
        wsrv = serve_worker("w-s", "127.0.0.1", 0, ctrl_url,
                            ProgressFakePredictor())
        wurl = f"http://127.0.0.1:{wsrv.server_address[1]}"
        threading.Thread(target=wsrv.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                wurl + "/predict",
                data=json.dumps({"video_path": "c.mp4",
                                 "stream": True}).encode(),
                headers={"Content-Type": "application/json"})
            events = []
            with urllib.request.urlopen(req, timeout=10) as resp:
                assert resp.headers["Content-Type"] == "application/x-ndjson"
                for line in resp:
                    line = line.strip()
                    if line:
                        events.append(json.loads(line))
            progress = [e["progress"] for e in events if "progress" in e]
            assert progress == [
                {"stage": "denoise", "i": 1, "n": 3},
                {"stage": "denoise", "i": 2, "n": 3},
                {"stage": "denoise", "i": 3, "n": 3},
                {"stage": "decode", "i": 1, "n": 1},
            ]
            assert events[-1] == {"output": "done:c.mp4"}
        finally:
            wsrv.worker.stop()
            wsrv.shutdown()
            ctrl.shutdown()

    def test_non_progress_predictor_still_streams_result(self):
        """A predictor without progress_cb support yields only the final
        result on the stream."""
        ctrl = serve_controller("127.0.0.1", 0)
        ctrl_url = f"http://127.0.0.1:{ctrl.server_address[1]}"
        threading.Thread(target=ctrl.serve_forever, daemon=True).start()
        wsrv = serve_worker("w-n", "127.0.0.1", 0, ctrl_url, FakePredictor())
        wurl = f"http://127.0.0.1:{wsrv.server_address[1]}"
        threading.Thread(target=wsrv.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                wurl + "/predict",
                data=json.dumps({"video_path": "x.mp4",
                                 "stream": True}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=10) as resp:
                events = [json.loads(l) for l in resp if l.strip()]
            assert events == [{"output": "done:x.mp4"}]
        finally:
            wsrv.worker.stop()
            wsrv.shutdown()
            ctrl.shutdown()
