"""Caption worker HTTP service ↔ EndpointCaptioner client round trip."""

import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

pytest.importorskip("PIL")

from upscale_a_video_tpu.captioner import EndpointCaptioner
from upscale_a_video_tpu.serving.caption_worker import make_handler


class FakeCaptioner:
    def __init__(self):
        self.seen = None

    def caption(self, img):
        self.seen = img.shape
        return f"a video frame of shape {img.shape[0]}x{img.shape[1]}"


@pytest.fixture()
def server():
    cap = FakeCaptioner()
    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              make_handler(cap, threading.Lock()))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield cap, f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_round_trip(server):
    cap, url = server
    client = EndpointCaptioner(url)
    frame = np.random.randint(0, 255, (600, 800, 3), np.uint8)
    text = client(frame)
    # client resizes short side to 512 (ref driver :162-168) before sending
    assert cap.seen is not None and min(cap.seen[:2]) == 512
    assert text.startswith("a video frame of shape")


def test_health(server):
    import urllib.request

    _, url = server
    with urllib.request.urlopen(url) as resp:
        assert resp.read() == b"ok"
