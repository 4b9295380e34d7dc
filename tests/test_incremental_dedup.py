"""Incremental LSH dedup (llm/dedup.py build_lsh_index /
incremental_lsh_candidates / merge_lsh_index).

The production dedup shape: the historical corpus's signatures are a
persisted index; a new increment is deduped against it without
re-scanning historical text. Proofs here:
 - equivalence: increment-vs-index output == the full-corpus pipeline's
   pairs restricted to pairs touching a new doc (uncapped),
 - the giant-bucket guard bounds flood buckets through the stored rep,
 - merge_lsh_index(index, inc) == build_lsh_index(old ∪ inc),
 - candidates feed jaccard_verify unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parseable_spark.llm import dedup as D
from tests.conftest import SF_SMALL

NO_CAP = 10**9


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )


def _pairs(df):
    return sorted((r["id_a"], r["id_b"]) for r in df.collect())


def test_incremental_equals_full_restricted_to_new(spark, docs):
    cut = docs.agg(F.expr("percentile(doc_id, 0.8)")).first()[0]
    old = docs.filter(F.col("doc_id") <= cut)
    new = docs.filter(F.col("doc_id") > cut)
    assert old.count() > 0 and new.count() > 0

    full = D.minhash_lsh_candidates(docs, bucket_cap=NO_CAP)
    want = _pairs(
        full.filter((F.col("id_a") > cut) | (F.col("id_b") > cut))
    )

    index = D.build_lsh_index(old)
    got = _pairs(D.incremental_lsh_candidates(new, index, bucket_cap=NO_CAP))
    assert got == want and len(got) > 0


def test_flood_bucket_pairs_through_stored_rep(spark):
    text = "the same flooded document body repeated verbatim many times over"
    old = spark.createDataFrame(
        [(i, text) for i in range(100)], "doc_id bigint, text string"
    )
    new = spark.createDataFrame([(1000, text)], "doc_id bigint, text string")
    index = D.build_lsh_index(old)
    got = _pairs(D.incremental_lsh_candidates(new, index, bucket_cap=8))
    # every index bucket is a 100-copy flood → the new doc pairs with
    # the stored representative only: one pair, not 100
    assert got == [(0, 1000)]
    # uncapped, the same probe emits all 100 old↔new pairs
    uncapped = _pairs(D.incremental_lsh_candidates(new, index, bucket_cap=NO_CAP))
    assert len(uncapped) == 100


def test_merge_index_equals_rebuild(spark, docs):
    cut = docs.agg(F.expr("percentile(doc_id, 0.7)")).first()[0]
    old = docs.filter(F.col("doc_id") <= cut)
    inc = docs.filter(F.col("doc_id") > cut)
    merged = D.merge_lsh_index(D.build_lsh_index(old), inc)
    rebuilt = D.build_lsh_index(docs)
    cols = ["doc_id", "band_idx", "band_hash", "bsz", "rep_id"]
    assert sorted(map(tuple, merged.select(cols).collect())) == sorted(
        map(tuple, rebuilt.select(cols).collect())
    )


def test_candidates_feed_jaccard_verify(spark, docs):
    # plant a near-duplicate of an existing doc as the increment
    base = docs.orderBy("doc_id").first()
    near = base["text"] + " appended tail words"
    new = spark.createDataFrame(
        [(999_999, near)], "doc_id bigint, text string"
    )
    index = D.build_lsh_index(docs)
    cands = D.incremental_lsh_candidates(new, index)
    verified = D.jaccard_verify(
        docs.unionByName(new), cands, threshold=0.4
    )
    hits = {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()
    }
    assert (base["doc_id"], 999_999) in hits
    assert hits[(base["doc_id"], 999_999)] >= 0.4


def test_probe_side_is_broadcast(spark, docs):
    new = docs.limit(5)
    index = D.build_lsh_index(docs)
    # inspect the new↔old probe join plan: the increment must be the
    # broadcast side so the index is never shuffled
    plan = (
        index.filter(F.col("bsz") <= 64)
        .join(
            F.broadcast(
                D.banded_rows(new).select(
                    F.col("doc_id").alias("new_id"), "band_idx", "band_hash"
                )
            ),
            ["band_idx", "band_hash"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
