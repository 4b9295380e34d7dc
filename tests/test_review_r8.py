"""Round-8 review-pass regression pins (sse.py, llm/multimodal.py —
the never-reviewed corners from VERDICT r7 next-5)."""

from __future__ import annotations


class TestSseAllowFailsClosed:
    def test_raising_allow_skips_client_not_fanout(self):
        """An authz callback that raises must fail CLOSED for that
        client and keep delivering to the rest — not abort broadcast
        and propagate into alert evaluation."""
        from parseable_spark.sse import SseBroadcaster

        b = SseBroadcaster()
        c1 = b.register("s1", "alice")
        c2 = b.register("s2", "deleted-user")
        c3 = b.register("s3", "carol")
        for c in (c1, c2, c3):
            c.q.get_nowait()  # drain the 'connected' frame

        def allow(principal: str) -> bool:
            if principal == "deleted-user":
                raise KeyError(principal)  # e.g. rbac row removed
            return True

        n = b.broadcast({"x": 1}, allow=allow)
        assert n == 2
        assert not c2.q.qsize()
        assert c1.q.qsize() == 1 and c3.q.qsize() == 1


class TestDurationFloodCap:
    def test_sample_frames_real_bounded_by_content(self, spark):
        """A 2-frame payload declaring a huge duration_ms must emit
        samples bounded by the CONTENT length, not the metadata."""
        import pandas as pd

        from parseable_spark.llm.multimodal import (
            MEDIA_SCHEMA,
            VIDEO_FRAME_MS,
            _build_payload,
            sample_frames_real,
        )

        payload = _build_payload(3, "video")  # 3%5+2 = 5 frames
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "media_id": [1],
                    "media_type": ["video"],
                    "payload": [payload],
                    "width": [None],
                    "height": [None],
                    "duration_ms": [10**12],  # adversarial metadata
                }
            ),
            MEDIA_SCHEMA,
        )
        rows = sample_frames_real(df, every_ms=VIDEO_FRAME_MS).collect()
        assert 0 < len(rows) <= 5  # content-bounded, returns promptly

    def test_sample_frames_stub_bounded_by_content(self, spark):
        import pandas as pd

        from parseable_spark.llm.multimodal import MEDIA_SCHEMA, sample_frames

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "media_id": [1],
                    "media_type": ["video"],
                    "payload": [b"x" * 64],
                    "width": [None],
                    "height": [None],
                    "duration_ms": [10**12],
                }
            ),
            MEDIA_SCHEMA,
        )
        rows = sample_frames(df, every_ms=1000).collect()
        assert 0 < len(rows) <= 8


class TestAviNestingCap:
    def test_adversarial_list_nesting_raises_value_error(self):
        """Data-controlled LIST recursion must fail as ValueError, not
        RecursionError (a ~12 KB nested-LIST payload)."""
        import struct

        import pytest

        from parseable_spark.llm.avi import decode_avi_mjpeg

        inner = b""
        for _ in range(500):
            inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"hdrl" + inner
        payload = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
        with pytest.raises(ValueError, match="nesting"):
            decode_avi_mjpeg(payload)

    def test_real_avi_still_decodes(self):
        from parseable_spark.llm.avi import decode_avi_mjpeg, encode_avi_mjpeg
        from parseable_spark.llm.jpeg import encode_jpeg
        import numpy as np

        frames = [
            encode_jpeg(np.full((16, 16, 3), i * 40, dtype=np.uint8))
            for i in range(3)
        ]
        meta = decode_avi_mjpeg(encode_avi_mjpeg(frames, 16, 16, fps=5))
        assert meta["n_frames"] == 3 and meta["fps"] == 5
