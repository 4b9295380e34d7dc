"""Audio spectral fingerprints (llm/audiohash.py) and video keyframe
dedup (llm/imagehash.py video functions), value-checked against
planted ground truth over the REAL codecs (RIFF/PCM WAV, BMP-stream
video containers).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from parseable_spark.llm import audiohash, imagehash
from parseable_spark.llm.multimodal import MEDIA_SCHEMA, encode_bmp_pixels


def _wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    pcm = np.clip(samples, -32768, 32767).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def _tone(freqs, n=16000, amp=8000, seed=None) -> np.ndarray:
    t = np.arange(n)
    sig = sum(amp * np.sin(2 * np.pi * f * t / 8000) for f in freqs)
    if seed is not None:
        sig = sig + np.random.default_rng(seed).normal(0, amp * 0.02, n)
    return sig


def _rich(seed_f, n=16000, amp=8000, noise_seed=None, noise=0.02) -> np.ndarray:
    """Harmonic stack with a slow chirp — broadband content shaped
    like real audio, where noise robustness is meaningful."""
    t = np.arange(n)
    f0 = 200 + seed_f * 37
    sig = sum(
        amp / (k + 1) * np.sin(2 * np.pi * f0 * (k + 1) * t / 8000 * (1 + 0.2 * t / n))
        for k in range(5)
    )
    if noise_seed is not None:
        sig = sig + np.random.default_rng(noise_seed).normal(0, amp * noise, n)
    return sig


def _pcm(sig: np.ndarray) -> np.ndarray:
    """The samples a WAV round-trip actually carries (int16-quantized),
    so driver-kernel comparisons see exactly what Spark decodes."""
    return np.clip(sig, -32768, 32767).astype("<i2").astype(np.float64)


def _dist(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


class TestAudioFingerprint:
    def test_deterministic(self):
        s = _tone([440, 880])
        assert audiohash.audio_fingerprint64(s) == audiohash.audio_fingerprint64(s)

    def test_amplitude_scaling_stays_near(self):
        s = _tone([440, 660])
        d = _dist(
            audiohash.audio_fingerprint64(s),
            audiohash.audio_fingerprint64(s * 0.25),
        )
        assert d <= 6

    def test_mild_noise_stays_near(self):
        clean = _rich(3)
        noisy = _rich(3, noise_seed=1)
        assert _dist(
            audiohash.audio_fingerprint64(clean),
            audiohash.audio_fingerprint64(noisy),
        ) <= 6

    def test_distinct_rich_content_far(self):
        ds = [
            _dist(
                audiohash.audio_fingerprint64(_rich(a)),
                audiohash.audio_fingerprint64(_rich(b)),
            )
            for a, b in [(1, 2), (2, 3), (3, 4)]
        ]
        assert min(ds) > 12

    def test_different_content_far(self):
        pairs = [([440], [3000]), ([440, 880], [700, 1900]), ([523], [620, 2500])]
        ds = [
            _dist(
                audiohash.audio_fingerprint64(_tone(a)),
                audiohash.audio_fingerprint64(_tone(b)),
            )
            for a, b in pairs
        ]
        assert min(ds) > 12

    def test_short_clip_pads(self):
        assert isinstance(audiohash.audio_fingerprint64(_tone([440], n=100)), int)


class TestAudioSpark:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [
            (0, _wav(_rich(3))),
            (1, _wav(_rich(3))),  # exact copy
            (2, _wav(_rich(3, noise_seed=2, noise=0.2))),  # near-dup, ~4 bits
            (3, _wav(_rich(7))),  # unrelated
        ]
        pdf = pd.DataFrame(
            [
                {
                    "media_id": i,
                    "media_type": "audio",
                    "payload": bytearray(p),
                    "width": 0,
                    "height": 0,
                    "duration_ms": 0,
                }
                for i, p in rows
            ]
        )
        return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)

    def test_spark_matches_driver_kernel(self, spark, media):
        got = {
            r["media_id"]: r["ahash"]
            for r in audiohash.audio_fingerprints(media).collect()
        }
        assert got[0] == audiohash.audio_fingerprint64(_pcm(_rich(3)))
        assert got[0] == got[1]

    def test_exact_and_near_groups(self, spark, media):
        hashes = audiohash.audio_fingerprints(media).localCheckpoint()
        exact = audiohash.exact_audio_dups(hashes).collect()
        assert len(exact) == 1 and list(exact[0]["member_ids"]) == [0, 1]
        pairs = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in audiohash.near_audio_dups(hashes, max_distance=6).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] == 0
        assert (0, 2) in pairs and pairs[(0, 2)] > 0
        assert not any(3 in p for p in pairs)


def _video(frame_rgbs, w=16, h=12) -> bytes:
    out = b""
    for rgb in frame_rgbs:
        px = np.full((h, w, 3), rgb, dtype=np.uint8)
        px[0 : h // 2, 0 : w // 2] = (rgb[2], rgb[0], rgb[1])  # structure
        out += encode_bmp_pixels(px)
    return out


class TestVideoDedup:
    @pytest.fixture(scope="class")
    def media(self, spark):
        a = [(200, 30, 40), (30, 200, 40), (40, 30, 200)]
        b = [(10, 120, 250), (250, 120, 10), (120, 250, 10)]
        rows = [
            (0, _video(a)),
            (1, _video(a)),  # full duplicate of 0
            (2, _video(a[:2] + [b[0]])),  # shares 2 of 3 frames with 0
            (3, _video(b)),  # unrelated
        ]
        pdf = pd.DataFrame(
            [
                {
                    "media_id": i,
                    "media_type": "video",
                    "payload": bytearray(p),
                    "width": 0,
                    "height": 0,
                    "duration_ms": 0,
                }
                for i, p in rows
            ]
        )
        return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)

    def test_frame_hashes(self, spark, media):
        rows = imagehash.video_frame_phashes(media).collect()
        by_vid = {}
        for r in rows:
            by_vid.setdefault(r["media_id"], {})[r["frame_idx"]] = r["phash"]
        assert all(len(v) == 3 for v in by_vid.values())
        assert by_vid[0] == by_vid[1]
        assert by_vid[0][0] == by_vid[2][0] and by_vid[0][2] != by_vid[2][2]

    def test_near_video_dups(self, spark, media):
        fh = imagehash.video_frame_phashes(media).localCheckpoint()
        pairs = {
            (r["id_a"], r["id_b"]): r["n_shared"]
            for r in imagehash.near_video_dups(fh, min_shared_frames=2).collect()
        }
        assert pairs[(0, 1)] == 3
        assert pairs[(0, 2)] == 2 and pairs[(1, 2)] == 2
        assert (0, 3) not in pairs and (2, 3) not in pairs

    def test_hub_frame_guard(self, spark, media):
        """A frame hash shared by more videos than hub_cap is excluded
        from pairing entirely."""
        fh = imagehash.video_frame_phashes(media).localCheckpoint()
        pairs = imagehash.near_video_dups(fh, min_shared_frames=1, hub_cap=1)
        # every shared frame exceeds a cap of 1 video... shared hashes
        # appear in >= 2 videos -> all dropped
        assert pairs.count() == 0
