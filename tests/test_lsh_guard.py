"""LSH giant-bucket guard: duplicate floods must not emit quadratic pairs.

A band bucket holding all s copies of a flooded document would emit
s(s-1)/2 candidate pairs from one task. With the guard, buckets past
`bucket_cap` switch to star pairs through the min-id representative:
s-1 pairs, cluster connectivity preserved.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parseable_spark.llm.dedup import connected_components, minhash_lsh_candidates


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


FLOOD = "the same spam document repeated over and over in the crawl"
N_FLOOD = 1000


def _flooded(spark):
    rows = [(i, FLOOD) for i in range(N_FLOOD)]
    rows += [
        (10_000, "a completely different document about distributed joins"),
        (10_001, "yet another unrelated text concerning window functions"),
    ]
    return _docs(spark, rows)


def test_giant_bucket_emits_linear_not_quadratic(spark):
    cands = minhash_lsh_candidates(_flooded(spark), bucket_cap=64)
    n = cands.count()
    # star topology: 999 pairs for the flood (identical docs share all
    # band buckets, so every band yields the same star), not ~499 500.
    assert n == N_FLOOD - 1, f"expected {N_FLOOD - 1} star pairs, got {n}"
    # every flood member is reachable from the representative
    rep = cands.agg(F.min("id_a")).collect()[0][0]
    assert rep == 0
    members = {r["id_b"] for r in cands.filter(F.col("id_a") == rep).collect()}
    assert members == set(range(1, N_FLOOD))


def test_guard_preserves_cluster_connectivity(spark):
    cands = minhash_lsh_candidates(_flooded(spark), bucket_cap=64)
    labels = connected_components(cands)
    clusters = (
        labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert {(r["cluster_id"], r["n"]) for r in clusters} == {(0, N_FLOOD)}


def test_cap_is_inert_below_threshold(spark):
    """On a corpus with no giant buckets, the guarded plan returns
    exactly the uncapped candidate set (the oracle-checked semantics)."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
        (3, "alpha beta gamma delta epsilon zeta"),
        (4, "totally disjoint words appear here instead"),
        (5, "more disjoint vocabulary in this final document"),
    ]
    docs = _docs(spark, rows)
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, bucket_cap=64).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, bucket_cap=10**9).collect()
    }
    assert capped == uncapped and capped


def test_no_cache_manager_entries_after_dedup_queries(spark):
    """VERDICT r2 wrong-3: the dedup pipeline must not leave pinned
    CacheManager entries behind (a long-lived service would accumulate
    cached lineage). The signature/shingle-set tables use eager
    localCheckpoint — reference-counted, freed with the result — so
    after a full run the cache manager holds nothing."""
    from parseable_spark.llm import dedup
    from parseable_spark.tables import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    cands = dedup.minhash_lsh_candidates(docs)
    verified = dedup.jaccard_verify(docs, cands, threshold=0.2)
    assert dedup.connected_components(verified).count() > 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_connected_components_long_chain(spark):
    """r6 review: plain min-label propagation moved the min id ONE hop
    per round, so a chain longer than max_iterations (incrementally
    edited boilerplate where only consecutive pairs clear the
    threshold) SILENTLY returned split clusters. Pointer jumping now
    converges in O(log diameter): a 60-hop path labels to node 0 well
    inside the default 20-round budget."""
    from parseable_spark.llm.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a bigint, id_b bigint"
    )
    out = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert set(out.values()) == {0}
    assert len(out) == 61
    # an impossible budget raises instead of returning wrong labels
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=1)
