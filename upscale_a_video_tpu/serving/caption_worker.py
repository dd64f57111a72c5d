"""Caption worker: an HTTP service hosting the JAX LLaVA captioner.

The reference runs LLaVA on a second GPU inside the driver process
(ref inference_upscale_a_video.py:55-62, llava/llava_agent.py); the TPU-native
deployment hosts the VLM on its own slice behind HTTP instead (the
`UAV_CAPTION_ENDPOINT` backend of captioner.py). Protocol — the client sends
the raw PNG with the question in a header:

    POST /  (Content-Type: image/png, X-Question: <prompt>) → text/plain

Serve:
    python -m upscale_a_video_tpu.serving.caption_worker \
        --model_dir /path/to/llava-v1.5 --port 21005 [--load_8bit]
"""

from __future__ import annotations

import argparse
import io
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..captioner import CAPTION_QUESTION


def make_handler(captioner, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (stdlib naming)
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                from PIL import Image

                img = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))
                # one TPU job at a time (the reference worker is also serial)
                with lock:
                    text = captioner.caption(img)
                out = text.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; charset=utf-8")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            except Exception as e:  # noqa: BLE001
                msg = f"caption error: {e}".encode()
                self.send_response(500)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

        def do_GET(self):  # noqa: N802 — health check
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def serve(captioner, port: int = 21005, host: str = "0.0.0.0"):
    server = ThreadingHTTPServer((host, port),
                                 make_handler(captioner, threading.Lock()))
    print(f"caption worker on :{port} (question default: {CAPTION_QUESTION!r})")
    server.serve_forever()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--base_dir", default=None,
                    help="base LLaMA for delta checkpoints")
    ap.add_argument("--port", type=int, default=21005)
    ap.add_argument("--load_8bit", action="store_true",
                    help="int8 weight-only storage (utils/quant.py)")
    ap.add_argument("--max_new_tokens", type=int, default=64)
    args = ap.parse_args()

    from ..models.llava.loader import load_llava_captioner

    cap = load_llava_captioner(args.model_dir, base_dir=args.base_dir,
                               max_new_tokens=args.max_new_tokens,
                               load_8bit=args.load_8bit)
    serve(cap, port=args.port)


if __name__ == "__main__":
    main()
