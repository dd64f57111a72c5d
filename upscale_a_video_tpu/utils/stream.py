"""Streaming multi-clip ingest: native ring buffer + decode thread pool.

The reference loads a whole video to GPU memory up front
(ref utils.py:7-26, inference_upscale_a_video.py:180-190). For production
streaming on TPU the ingest path instead overlaps host work with device work:
a pool of decode threads fills a fixed-size native ring buffer
(native/frameproc.cpp ring section) with decoded frames while the consumer
drains clips, normalizes them with the threaded C++ kernels, and hands them to
``jax.device_put`` — so the TPU never waits on the codec.

``FrameRing`` wraps the C ring; ``ClipStreamer`` runs the pool and yields
``(path, clip_index, frames_f32)`` clips in order. A pure-Python queue
fallback keeps everything working without the native toolchain.
"""

from __future__ import annotations

import ctypes
import queue
import threading
from typing import Callable, Iterator, Optional, Sequence, Tuple

import numpy as np

from .native_frameproc import _load, normalize_u8


class FrameRing:
    """Fixed-slot frame ring over the native buffer (FIFO in reserve order)."""

    def __init__(self, slots: int, frame_shape: Tuple[int, ...],
                 dtype=np.uint8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frameproc library unavailable")
        self._lib = lib
        self.frame_shape = tuple(frame_shape)
        self.dtype = np.dtype(dtype)
        self.slot_bytes = int(np.prod(frame_shape)) * self.dtype.itemsize
        self._h = lib.fp_ring_create(slots, self.slot_bytes)
        if not self._h:
            raise ValueError("bad ring geometry")

    def _view(self, ticket: int) -> np.ndarray:
        ptr = self._lib.fp_ring_slot(self._h, ticket)
        buf = (ctypes.c_char * self.slot_bytes).from_address(ptr)
        return np.frombuffer(buf, dtype=self.dtype).reshape(self.frame_shape)

    def push(self, frame: np.ndarray, timeout_ms: int = -1) -> bool:
        """Copy one frame in (blocks while full). False on timeout/closed."""
        t = self._lib.fp_ring_reserve(self._h, timeout_ms)
        if t < 0:
            return False
        view = self._view(t)
        view[...] = frame
        self._lib.fp_ring_commit(self._h, t)
        return True

    def pop(self, timeout_ms: int = -1) -> Optional[np.ndarray]:
        """Copy the oldest frame out; None when closed-and-drained/timeout."""
        t = self._lib.fp_ring_pop(self._h, timeout_ms)
        if t < 0:
            return None
        out = self._view(t).copy()
        self._lib.fp_ring_release(self._h, t)
        return out

    def pending(self) -> int:
        return int(self._lib.fp_ring_pending(self._h))

    def close(self):
        self._lib.fp_ring_close(self._h)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.fp_ring_destroy(h)
            self._h = None


class _QueueRing:
    """Python fallback with the same push/pop surface."""

    def __init__(self, slots: int):
        self._q: queue.Queue = queue.Queue(maxsize=slots)
        self._closed = threading.Event()

    def push(self, frame, timeout_ms: int = -1) -> bool:
        if self._closed.is_set():
            return False
        try:
            self._q.put(np.array(frame),
                        timeout=None if timeout_ms < 0 else timeout_ms / 1e3)
            return True
        except queue.Full:
            return False

    def pop(self, timeout_ms: int = -1):
        while True:
            try:
                return self._q.get(timeout=0.05)
            except queue.Empty:
                if self._closed.is_set() and self._q.empty():
                    return None
                if timeout_ms >= 0:
                    timeout_ms -= 50
                    if timeout_ms < 0:
                        return None

    def pending(self) -> int:
        return self._q.qsize()

    def close(self):
        self._closed.set()


def make_ring(slots: int, frame_shape: Tuple[int, ...], dtype=np.uint8):
    try:
        return FrameRing(slots, frame_shape, dtype)
    except Exception:
        return _QueueRing(slots)


class ClipStreamer:
    """Decode many clips through one ring; yield normalized clip arrays.

    ``reader(path)`` yields (T, H, W, C) uint8 frame batches (defaults to
    utils.video_io). Clips are streamed *in path order*; within the ring the
    unit is one frame batch so short clips don't stall long ones.
    """

    def __init__(self, paths: Sequence[str], frame_shape: Tuple[int, ...],
                 slots: int = 8,
                 reader: Optional[Callable] = None,
                 normalize: bool = True):
        self.paths = list(paths)
        self.normalize = normalize
        self.ring = make_ring(slots, frame_shape, np.uint8)
        self._meta: queue.Queue = queue.Queue()
        self._reader = reader or _default_reader
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        for pi, path in enumerate(self.paths):
            try:
                for frames in self._reader(path):
                    self._meta.put((path, pi, len(frames), None))
                    for f in frames:
                        self.ring.push(f)
            except Exception as e:  # noqa: BLE001 — a bad clip must not kill the run
                self._meta.put((path, pi, 0, e))
        self._meta.put(None)
        self.ring.close()

    def __iter__(self) -> Iterator[Tuple[str, int, np.ndarray]]:
        while True:
            meta = self._meta.get()
            if meta is None:
                return
            path, pi, count, err = meta
            if err is not None:
                # reference prints-and-continues on per-video failure
                # (ref inference_upscale_a_video.py:307-321)
                print(f"stream: skipping {path}: {err}")
                continue
            frames = [self.ring.pop() for _ in range(count)]
            clip = np.stack([f for f in frames if f is not None])
            if self.normalize:
                yield path, pi, normalize_u8(clip)
            else:
                yield path, pi, clip


def _default_reader(path: str):
    from .video_io import read_video

    frames, _fps, _name = read_video(path)
    yield np.asarray(frames, np.uint8)
