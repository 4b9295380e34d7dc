"""Sharded Bloom-filter membership index (llm/bloom.py).

The contract that matters for curation: ZERO false negatives (nothing
already in the corpus sneaks back in), a measured false-positive rate
near the textbook prediction, and merge(a, b) bit-identical to a
rebuild over the union — the property that makes rolling ingestion
(OR the increment's sub-filter in) exact.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parseable_spark.llm import bloom

GEO = dict(num_shards=8, bits_per_shard=1 << 16, num_hashes=7)


def _docs(spark, prefix: str, n: int):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [f"{prefix}{i}" for i in range(n)],
                "text": [f"{prefix} corpus document {i} payload" for i in range(n)],
            }
        )
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(spark, "base", 2000)


@pytest.fixture(scope="module")
def built(spark, corpus):
    bf = bloom.bloom_build(corpus, "text", **GEO).cache()
    yield bf
    bf.unpersist()  # keep the shared session's CacheManager clean


class TestBuildProbe:
    def test_no_false_negatives(self, corpus, built):
        tagged = bloom.bloom_probe(corpus, built, "text", **GEO)
        assert tagged.filter(~F.col("maybe_member")).count() == 0

    def test_payload_columns_ride_through(self, corpus, built):
        tagged = bloom.bloom_probe(corpus, built, "text", **GEO)
        assert set(tagged.columns) == {"doc_id", "text", "maybe_member"}
        assert tagged.count() == 2000

    def test_fresh_keys_mostly_miss(self, spark, built):
        fresh = _docs(spark, "novel", 5000)
        fp = (
            bloom.bloom_probe(fresh, built, "text", **GEO)
            .filter("maybe_member")
            .count()
        )
        # fill ~2.6% -> est fpp ~1e-11; allow slack far above that
        assert fp <= 5

    def test_filter_new_drops_members_keeps_fresh(self, spark, corpus, built):
        fresh = _docs(spark, "novel", 500)
        out = bloom.bloom_filter_new(
            corpus.unionByName(fresh), built, "text", **GEO
        )
        kept = {r["doc_id"] for r in out.collect()}
        assert all(d.startswith("novel") for d in kept)
        assert len(kept) >= 495  # fpp slack
        assert "maybe_member" not in out.columns

    def test_build_deterministic(self, corpus, built):
        again = bloom.bloom_build(corpus, "text", **GEO)
        a = {r["shard_id"]: bytes(r["bitmap"]) for r in built.collect()}
        b = {r["shard_id"]: bytes(r["bitmap"]) for r in again.collect()}
        assert a == b


class TestMergeIncremental:
    def test_merge_equals_rebuild(self, spark, corpus, built):
        half_a = corpus.filter(F.xxhash64("doc_id") % 2 == 0)
        half_b = corpus.filter(F.xxhash64("doc_id") % 2 != 0)
        merged = bloom.bloom_merge(
            bloom.bloom_build(half_a, "text", **GEO),
            bloom.bloom_build(half_b, "text", **GEO),
        )
        a = {r["shard_id"]: bytes(r["bitmap"]) for r in built.collect()}
        b = {r["shard_id"]: bytes(r["bitmap"]) for r in merged.collect()}
        assert a == b

    def test_rolling_ingestion_cycle(self, spark, corpus, built):
        """Survivors of the gate, committed via merge, are members on
        the next epoch's probe — the production loop end to end."""
        inc = _docs(spark, "epoch2", 300)
        survivors = bloom.bloom_filter_new(inc, built, "text", **GEO)
        rolled = bloom.bloom_merge(
            built, bloom.bloom_build(survivors, "text", **GEO)
        )
        again = bloom.bloom_probe(inc, rolled, "text", **GEO)
        assert again.filter(~F.col("maybe_member")).count() == 0


class TestCalibration:
    def test_measured_fpp_near_theoretical(self, spark):
        """Deliberately saturated geometry so false positives are
        plentiful enough to measure: n=4000 items into one 2^14-bit
        shard, k=4 -> textbook fpp (1-e^(-kn/m))^k ~ 0.17."""
        geo = dict(num_shards=1, bits_per_shard=1 << 14, num_hashes=4)
        n, m, k = 4000, 1 << 14, 4
        base = _docs(spark, "sat", n)
        bf = bloom.bloom_build(base, "text", **geo)
        probe_n = 8000
        fresh = _docs(spark, "probefp", probe_n)
        fp = (
            bloom.bloom_probe(fresh, bf, "text", **geo)
            .filter("maybe_member")
            .count()
        )
        theo = (1 - math.exp(-k * n / m)) ** k
        assert 0.3 * theo <= fp / probe_n <= 3.0 * theo

    def test_fill_ratio_gauge(self, spark):
        geo = dict(num_shards=1, bits_per_shard=1 << 14, num_hashes=4)
        bf = bloom.bloom_build(_docs(spark, "sat", 4000), "text", **geo)
        row = bloom.bloom_fill_ratio(bf, num_hashes=4).collect()[0]
        expect_fill = 1 - math.exp(-4 * 4000 / (1 << 14))
        assert abs(row["fill"] - expect_fill) < 0.05
        assert abs(row["est_fpp"] - row["fill"] ** 4) < 1e-12

    def test_bloom_params_textbook(self):
        m, k = bloom.bloom_params(1_000_000, 0.01)
        assert 9_585_000 < m < 9_586_000  # -n ln p / ln^2 2
        assert k == 7
        with pytest.raises(ValueError):
            bloom.bloom_params(0, 0.01)
        with pytest.raises(ValueError):
            bloom.bloom_params(10, 1.5)


class TestPlanQuality:
    def test_no_row_python_and_cogrouped_probe(self, spark, corpus, built):
        plan = bloom.bloom_probe(corpus, built, "text", **GEO)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan  # no row-at-a-time Python
        assert "FlatMapCoGroupsInPandas" in plan  # co-partitioned probe

    def test_geometry_validation(self, spark, corpus):
        with pytest.raises(ValueError):
            bloom.bloom_build(corpus, "text", num_shards=4, bits_per_shard=12)
        with pytest.raises(ValueError):
            bloom.bloom_build(corpus, "text", num_shards=4, bits_per_shard=1 << 31)
