"""Async host→device prefetch (SURVEY §2.11 N9 / §2.12: "async host prefetch
feeding device").

The reference uploads each clip synchronously before running
(inference_upscale_a_video.py:181). Here a small thread pool decodes /
preprocesses the NEXT clip(s) and issues ``jax.device_put`` while the TPU is
busy with the current one, hiding host I/O behind device compute. Works for
any iterator of numpy pytrees.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


def device_prefetch(
    iterable: Iterable,
    buffer_size: int = 2,
    device=None,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Yield items of ``iterable`` as device arrays, prefetched ahead.

    ``transform`` runs host-side in the worker thread (decode/normalize);
    its output pytree is device_put before being queued.
    """
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    sentinel = object()
    err_box = {}

    def worker():
        try:
            for item in iterable:
                if transform is not None:
                    item = transform(item)
                item = jax.device_put(item, device)
                q.put(item)
        except Exception as e:  # surfaced on the consumer side
            err_box["err"] = e
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is sentinel:
            if "err" in err_box:
                raise err_box["err"]
            return
        yield item


class ClipPrefetcher:
    """Video-specific prefetcher: decodes and normalizes clips from paths
    while the device processes the previous clip."""

    def __init__(self, paths, buffer_size: int = 2, max_frames: Optional[int] = None):
        from . import video_io

        def gen():
            for path in paths:
                frames_u8, fps, name = video_io.read_video(path)
                if max_frames:
                    frames_u8 = frames_u8[:max_frames]
                frames = video_io.to_model_range(frames_u8)
                yield {"frames": frames[None], "fps": fps, "name": name}

        def transform(item):
            # only the array crosses to the device
            return {**item, "frames": item["frames"]}

        self._it = device_prefetch(gen(), buffer_size=buffer_size)

    def __iter__(self):
        return self._it
