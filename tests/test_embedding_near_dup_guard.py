"""Embedding near-dup bucket guard: a flood of identical embeddings
(boilerplate docs embedded alike — the most duplicated objects in any
web scrape) must emit linear star pairs, not s(s-1)/2 from one LSH
bucket. Mirrors tests/test_lsh_guard.py for the text-LSH guard.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from parseable_spark.llm.similarity import embedding_near_dups

DIM = 16
N_FLOOD = 500


def _emb_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )


def _flooded(spark):
    flood_vec = [0.5] * DIM
    rows = [(i, flood_vec) for i in range(N_FLOOD)]
    # two distinct vectors in other buckets (first coordinate negative)
    rows.append((10_000, [-1.0] + [0.1] * (DIM - 1)))
    rows.append((10_001, [-1.0] + [0.2] * (DIM - 1)))
    return _emb_df(spark, rows)


def test_flood_emits_linear_star_pairs(spark):
    pairs = embedding_near_dups(
        _flooded(spark), threshold=0.9, bucket_cap=64
    )
    rows = pairs.collect()
    flood_pairs = [r for r in rows if r["id_b"] < 10_000]
    # star through the min-id rep: N-1 pairs, not ~124 750
    assert len(flood_pairs) == N_FLOOD - 1
    assert all(r["id_a"] == 0 for r in flood_pairs)
    assert {r["id_b"] for r in flood_pairs} == set(range(1, N_FLOOD))
    # identical vectors score cosine 1.0 through the rep path too
    assert all(r["cosine_sim"] == 1.0 for r in flood_pairs)


def test_cap_inert_below_threshold_matches_uncapped(spark):
    rows = [
        (1, [1.0, 0.9] + [0.0] * (DIM - 2)),
        (2, [0.9, 1.0] + [0.0] * (DIM - 2)),
        (3, [1.0, 1.0] + [0.0] * (DIM - 2)),
        (4, [-1.0, 0.5] + [0.0] * (DIM - 2)),
        (5, [-0.9, 0.6] + [0.0] * (DIM - 2)),
    ]
    df = _emb_df(spark, rows)
    capped = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in embedding_near_dups(df, threshold=0.3, bucket_cap=64).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in embedding_near_dups(df, threshold=0.3, bucket_cap=None).collect()
    }
    assert capped == uncapped and capped


def test_no_cache_entries_left(spark):
    """The guard's snapshot is a localCheckpoint, not a CacheManager
    pin (the suite-wide empty-CacheManager invariant)."""
    embedding_near_dups(_flooded(spark), threshold=0.9, bucket_cap=8).count()
    jspark = spark._jsparkSession
    assert jspark.sharedState().cacheManager().isEmpty()
