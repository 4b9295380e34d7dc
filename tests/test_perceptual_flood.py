"""Flood guards on the perceptual dedup joins (VERDICT r4 wrong-1/-2).

Blank/placeholder images are the most duplicated objects in a web
scrape; an unguarded banded self-join over s copies of one tracking
pixel emits s(s-1)/2 pairs from ONE key. These tests plant exactly that
flood (hash-level, no codec decode — the guards live in the join, not
the decoder) and assert the output stays LINEAR while connectivity is
preserved for connected-components clustering, mirroring the text-LSH
bucket discipline of llm/dedup.py:128.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from parseable_spark.llm import audiohash, imagehash
from parseable_spark.llm.dedup import connected_components

HASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), True),
    ]
)

FLOOD = 10_000  # identical copies of the "tracking pixel" hash
BASE = 0x0123_4567_89AB_CDEF


def _hashes(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "phash"]), schema=HASH_SCHEMA
    )


@pytest.fixture(scope="module")
def flood_hashes(spark):
    rows = [(i, BASE) for i in range(FLOOD)]
    near = BASE ^ 0b11  # distance 2 from the flood hash
    rows += [(FLOOD + i, near) for i in range(5)]
    rows += [(FLOOD + 100, ~BASE & (2**63 - 1))]  # far away
    df = _hashes(spark, rows).localCheckpoint()
    yield df


class TestIdenticalHashFlood:
    def test_candidate_rows_linear_not_quadratic(self, spark, flood_hashes):
        """10k identical images: star intra-group (9 999) + full clique
        of the 5-member near group (10) + flood-rep × near members (5).
        The unguarded join would emit ~50 M pairs."""
        pairs = imagehash.near_image_dups(flood_hashes, max_distance=6)
        assert pairs.count() == (FLOOD - 1) + 10 + 5

    def test_connectivity_preserved(self, spark, flood_hashes):
        """Star edges must leave connected_components identical to the
        full clique: one cluster of flood + near members."""
        pairs = imagehash.near_image_dups(flood_hashes, max_distance=6)
        comp = connected_components(pairs).collect()
        clusters = {}
        for r in comp:
            clusters.setdefault(r["cluster_id"], set()).add(r["node"])
        assert len(clusters) == 1
        assert clusters[0] == set(range(FLOOD + 5))

    def test_small_groups_unchanged_semantics(self, spark):
        """Groups at or under group_cap keep the exact member-level
        pair set of the unguarded join (full bipartite cross +
        intra cliques)."""
        rows = [(0, BASE), (1, BASE), (2, BASE ^ 0b111), (3, ~BASE & 2**63 - 1)]
        pairs = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in imagehash.near_image_dups(
                _hashes(spark, rows), max_distance=6
            ).collect()
        }
        assert pairs == {(0, 1): 0, (0, 2): 3, (1, 2): 3}


class TestBandBucketStarGuard:
    def test_distinct_hash_band_flood_bounded(self, spark):
        """200 DISTINCT hashes in one Hamming-6 ball share band buckets;
        bucket_cap=4 must keep the pair count far below the 19 900-pair
        clique while components stay whole."""
        # flip PAIRS of high bits (bits 8..63) -> distinct hashes all
        # within distance 4 of each other and 2 of BASE, every one
        # sharing band 0 exactly -> a 200-member distinct-hash band
        # bucket, the star-guard's target shape
        from itertools import combinations, islice

        flips = islice(combinations(range(8, 63), 2), 199)  # keep off the sign bit
        rows = [(0, BASE)] + [
            (i + 1, BASE ^ (1 << a) ^ (1 << b))
            for i, (a, b) in enumerate(flips)
        ]
        df = _hashes(spark, rows).localCheckpoint()
        guarded = imagehash.near_image_dups(
            df, max_distance=6, bucket_cap=4
        )
        n = guarded.count()
        full_clique = 200 * 199 // 2
        assert 0 < n < full_clique // 4
        comp = connected_components(guarded).collect()
        assert len({r["cluster_id"] for r in comp}) == 1
        assert len(comp) == 200

    def test_guard_pairs_are_exact_distances(self, spark):
        from itertools import combinations, islice

        flips = islice(combinations(range(8, 63), 2), 49)
        rows = [(0, BASE)] + [
            (i + 1, BASE ^ (1 << a) ^ (1 << b))
            for i, (a, b) in enumerate(flips)
        ]
        df = _hashes(spark, rows)
        for r in imagehash.near_image_dups(df, max_distance=6, bucket_cap=4).collect():
            ph = dict(rows)
            want = bin((ph[r["id_a"]] ^ ph[r["id_b"]]) & (2**64 - 1)).count("1")
            assert r["distance"] == want <= 6


class TestBoundedExactGroupPayload:
    def test_mega_group_row_is_capped(self, spark, flood_hashes):
        groups = {
            r["phash"]: r
            for r in imagehash.exact_image_dups(
                flood_hashes, sample_cap=16
            ).collect()
        }
        g = groups[BASE]
        assert g["n_copies"] == FLOOD  # true count survives the cap
        assert g["rep_id"] == 0
        assert list(g["member_ids"]) == list(range(16))  # capped sample
        assert groups[BASE ^ 0b11]["n_copies"] == 5
        assert list(groups[BASE ^ 0b11]["member_ids"]) == [
            FLOOD + i for i in range(5)
        ]

    def test_audio_mirrors_image_shape(self, spark):
        rows = [(i, 7) for i in range(100)] + [(100, ~7 & 2**63 - 1)]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "ahash"]),
            schema=StructType(
                [
                    StructField("media_id", LongType(), False),
                    StructField("ahash", LongType(), True),
                ]
            ),
        )
        g = audiohash.exact_audio_dups(df, sample_cap=8).collect()
        assert len(g) == 1
        assert g[0]["n_copies"] == 100 and len(g[0]["member_ids"]) == 8
        # the near join inherits the guards: star output, linear
        assert audiohash.near_audio_dups(df, max_distance=6).count() == 99


class TestPlanStaysJvmSide:
    def test_no_python_eval_in_guarded_plan(self, spark, flood_hashes):
        plan = (
            imagehash.near_image_dups(flood_hashes)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
