"""Perceptual image hash + image dedup (llm/imagehash.py).

Value checks run against planted ground truth: re-encodes of the same
picture must collide (or land within a few bits), perturbations must
stay near, distinct pictures must stay far; the banded near-dup join
must find exactly the planted pairs with popcount distances matching
an independent Python computation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from parseable_spark.llm import imagehash
from parseable_spark.llm.multimodal import MEDIA_SCHEMA, encode_bmp_pixels


def _img(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h // 8, w // 8, 3), dtype=np.uint8)
    return np.kron(base, np.ones((8, 8, 1), dtype=np.uint8)).astype(np.uint8)


def _media_df(spark, rows):
    pdf = pd.DataFrame(
        [
            {
                "media_id": i,
                "media_type": "image",
                "payload": bytearray(p),
                "width": 0,
                "height": 0,
                "duration_ms": 0,
            }
            for i, p in rows
        ]
    )
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)


class TestPhash64:
    def test_deterministic_and_64bit(self):
        px = _img(1)
        assert imagehash.phash64(px) == imagehash.phash64(px)
        assert -(1 << 63) <= imagehash.phash64(px) < (1 << 63)

    def test_brightness_shift_stays_near(self):
        px = _img(2)
        shifted = np.clip(px.astype(np.int16) + 30, 0, 255).astype(np.uint8)
        d = bin(
            (imagehash.phash64(px) ^ imagehash.phash64(shifted)) & (2**64 - 1)
        ).count("1")
        # a uniform shift moves only the DC coefficient (median-
        # excluded); the residual bits come from clipping at 255
        assert d <= 6

    def test_jpeg_reencode_stays_near(self):
        from parseable_spark.llm import jpeg

        px = _img(3)
        decoded = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=85))
        d = bin(
            (imagehash.phash64(px) ^ imagehash.phash64(decoded)) & (2**64 - 1)
        ).count("1")
        assert d <= 6

    def test_distinct_images_far(self):
        ds = [
            bin(
                (imagehash.phash64(_img(a)) ^ imagehash.phash64(_img(b)))
                & (2**64 - 1)
            ).count("1")
            for a, b in [(4, 5), (5, 6), (6, 7)]
        ]
        assert min(ds) > 12


class TestSparkPipeline:
    @pytest.fixture(scope="class")
    def media(self, spark):
        a, b = _img(10), _img(11)
        a_tweak = a.copy()
        a_tweak[0:8, 0:8] = 255 - a_tweak[0:8, 0:8]  # one block inverted
        rows = [
            (0, encode_bmp_pixels(a)),
            (1, encode_bmp_pixels(a)),  # exact copy of 0
            (2, encode_bmp_pixels(a_tweak)),  # near-dup of 0 (distance ~4)
            (3, encode_bmp_pixels(b)),  # unrelated
        ]
        return _media_df(spark, rows)

    def test_hashes_match_driver_kernel(self, spark, media):
        got = {
            r["media_id"]: r["phash"]
            for r in imagehash.image_phashes(media).collect()
        }
        assert got[0] == imagehash.phash64(_img(10))
        assert got[0] == got[1]
        assert got[3] != got[0]

    def test_exact_groups(self, spark, media):
        groups = imagehash.exact_image_dups(imagehash.image_phashes(media)).collect()
        assert len(groups) == 1
        assert groups[0]["rep_id"] == 0 and list(groups[0]["member_ids"]) == [0, 1]

    def test_near_dups_planted(self, spark, media):
        hashes = imagehash.image_phashes(media)
        pairs = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in imagehash.near_image_dups(hashes, max_distance=6).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] == 0
        assert (0, 2) in pairs and 0 < pairs[(0, 2)] <= 6
        assert (1, 2) in pairs
        assert not any(3 in p for p in pairs)
        # distances match an independent popcount
        ph = {r["media_id"]: r["phash"] for r in hashes.collect()}
        for (a, b), d in pairs.items():
            assert d == bin((ph[a] ^ ph[b]) & (2**64 - 1)).count("1")

    def test_banding_validation(self, spark, media):
        hashes = imagehash.image_phashes(media)
        with pytest.raises(ValueError):
            imagehash.near_image_dups(hashes, max_distance=8, bands=8)
        with pytest.raises(ValueError):
            imagehash.near_image_dups(hashes, bands=7)

    def test_join_is_jvm_side(self, spark, media):
        hashes = imagehash.image_phashes(media).localCheckpoint()
        plan = (
            imagehash.near_image_dups(hashes)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
