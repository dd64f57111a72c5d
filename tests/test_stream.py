"""Native ring buffer + clip streamer: FIFO order, blocking, close semantics,
multi-producer commits, and end-to-end streaming with normalization."""

import threading

import numpy as np
import pytest

from upscale_a_video_tpu.utils.native_frameproc import _load
from upscale_a_video_tpu.utils.stream import ClipStreamer, FrameRing, make_ring

native = _load() is not None
needs_native = pytest.mark.skipif(not native, reason="native lib unavailable")


@needs_native
class TestFrameRing:
    def test_fifo_roundtrip(self):
        ring = FrameRing(4, (2, 2), np.uint8)
        for i in range(3):
            assert ring.push(np.full((2, 2), i, np.uint8))
        assert ring.pending() == 3
        for i in range(3):
            np.testing.assert_array_equal(ring.pop(), np.full((2, 2), i))

    def test_wraparound_order(self):
        ring = FrameRing(2, (4,), np.uint8)
        out = []

        def consume():
            while True:
                f = ring.pop()
                if f is None:
                    return
                out.append(int(f[0]))

        c = threading.Thread(target=consume)
        c.start()
        for i in range(20):  # 10× capacity forces reuse + blocking pushes
            assert ring.push(np.full((4,), i, np.uint8))
        ring.close()
        c.join(timeout=10)
        assert out == list(range(20))

    def test_pop_timeout_empty(self):
        ring = FrameRing(2, (1,))
        assert ring.pop(timeout_ms=50) is None

    def test_push_timeout_full(self):
        ring = FrameRing(1, (1,))
        assert ring.push(np.zeros(1, np.uint8))
        assert not ring.push(np.zeros(1, np.uint8), timeout_ms=50)

    def test_closed_drains_then_none(self):
        ring = FrameRing(4, (1,))
        ring.push(np.array([7], np.uint8))
        ring.close()
        assert ring.pop()[0] == 7
        assert ring.pop() is None
        assert not ring.push(np.array([1], np.uint8))

    def test_multiproducer_commit_order(self):
        """Commits land out of order; pops must still follow reserve order."""
        ring = FrameRing(8, (1,), np.uint8)
        lib, h = ring._lib, ring._h
        t0 = lib.fp_ring_reserve(h, -1)
        t1 = lib.fp_ring_reserve(h, -1)
        ring._view(t1)[...] = 11
        lib.fp_ring_commit(h, t1)  # newer commits first
        assert ring.pending() == 0  # not visible until t0 lands
        ring._view(t0)[...] = 10
        lib.fp_ring_commit(h, t0)
        assert ring.pending() == 2
        assert ring.pop()[0] == 10
        assert ring.pop()[0] == 11


class TestFallbackRing:
    def test_queue_ring_surface(self):
        from upscale_a_video_tpu.utils.stream import _QueueRing

        ring = _QueueRing(2)
        assert ring.push(np.array([1]))
        np.testing.assert_array_equal(ring.pop(), [1])
        ring.close()
        assert ring.pop(timeout_ms=100) is None


class TestClipStreamer:
    def test_streams_in_order_and_normalizes(self):
        clips = {f"clip{i}": np.full((3, 4, 4, 3), 40 * i, np.uint8)
                 for i in range(4)}

        def reader(path):
            yield clips[path]

        got = list(ClipStreamer(list(clips), (4, 4, 3), slots=4, reader=reader))
        assert [p for p, _, _ in got] == list(clips)
        for i, (_, pi, arr) in enumerate(got):
            assert pi == i
            assert arr.dtype == np.float32
            want = (40 * i / 255.0 - 0.5) * 2.0
            np.testing.assert_allclose(arr, want, atol=1e-6)

    def test_bad_clip_skipped(self):
        def reader(path):
            if path == "bad":
                raise RuntimeError("decode fail")
            yield np.zeros((2, 2, 2, 3), np.uint8)

        got = list(ClipStreamer(["ok1", "bad", "ok2"], (2, 2, 3), slots=4,
                                reader=reader))
        assert [p for p, _, _ in got] == ["ok1", "ok2"]
