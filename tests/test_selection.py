"""DSIR importance resampling (llm/selection.py): bucket ratios and
per-document log weights pinned against an independent pure-Python
implementation (dict counters, no Spark), plus the behavioral check
that resampling enriches for the target domain and the plan stays
UDF-free.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parseable_spark.llm import selection

B = 256  # small bucket space so collisions are exercised
SMOOTH = 1.0

TARGET = [
    "spark shuffle partitions broadcast join executor",
    "catalyst optimizer pushdown partition pruning",
    "executor memory shuffle spill broadcast join",
]
RAW = [
    ("r1", "spark broadcast join executor shuffle partitions"),  # on-target
    ("r2", "catalyst pushdown partition pruning optimizer"),  # on-target
    ("r3", "cake recipe flour sugar butter oven"),  # off-target
    ("r4", "garden flowers bloom spring rain soil"),  # off-target
    ("r5", "spark shuffle cake flour executor sugar"),  # mixed
    ("r6", "weather rain storm wind cloud forecast"),  # off-target
]


def _xxhash64(spark, grams):
    """Ground-truth bucket ids via Spark's own xxhash64 (the hash is
    JVM-side; the reference reuses only the hash, not the pipeline)."""
    df = spark.createDataFrame(pd.DataFrame({"g": grams}))
    rows = df.select("g", F.pmod(F.xxhash64("g"), F.lit(B)).alias("b")).collect()
    return {r["g"]: r["b"] for r in rows}


def _grams(text):
    ws = text.lower().split()
    return ws + [" ".join(p) for p in zip(ws, ws[1:])]


@pytest.fixture(scope="module")
def target_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": [f"t{i}" for i in range(len(TARGET))], "text": TARGET})
    )


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(pd.DataFrame(RAW, columns=["doc_id", "text"]))


@pytest.fixture(scope="module")
def ratios(target_df, raw_df):
    r = selection.dsir_log_ratios(target_df, raw_df, buckets=B, smoothing=SMOOTH).cache()
    yield r
    r.unpersist()  # keep the shared session's CacheManager clean


@pytest.fixture(scope="module")
def bucket_of(spark):
    grams = set()
    for t in TARGET + [t for _, t in RAW]:
        grams.update(_grams(t))
    return _xxhash64(spark, sorted(grams))


class TestRatiosAndWeights:
    def test_ratios_match_reference(self, ratios, bucket_of):
        tc, rc = Counter(), Counter()
        for t in TARGET:
            tc.update(bucket_of[g] for g in _grams(t))
        for _, t in RAW:
            rc.update(bucket_of[g] for g in _grams(t))
        t_total, r_total = sum(tc.values()), sum(rc.values())
        got = {r["bucket"]: r["log_ratio"] for r in ratios.collect()}
        # dense table: every bucket in [0, B), including those unseen
        # in both corpora (their smoothed ratio is the totals constant,
        # not 0 — the sparse-table-plus-default-0 shape under-weighted
        # unseen features whenever corpus totals differ)
        assert set(got) == set(range(B))
        for b in got:
            exp = math.log(tc.get(b, 0) + SMOOTH) - math.log(t_total + SMOOTH * B) - (
                math.log(rc.get(b, 0) + SMOOTH) - math.log(r_total + SMOOTH * B)
            )
            assert got[b] == pytest.approx(exp, abs=1e-9)

    def test_weights_match_reference(self, raw_df, ratios, bucket_of):
        lr = {r["bucket"]: r["log_ratio"] for r in ratios.collect()}
        got = {
            r["doc_id"]: r
            for r in selection.dsir_log_weights(raw_df, ratios, buckets=B).collect()
        }
        for doc_id, text in RAW:
            grams = _grams(text)
            exp = sum(lr.get(bucket_of[g], 0.0) for g in grams)
            assert got[doc_id]["n_features"] == len(grams)
            assert got[doc_id]["log_weight"] == pytest.approx(exp, abs=1e-5), doc_id

    def test_unseen_features_get_totals_constant_not_zero(
        self, spark, raw_df, target_df, ratios, bucket_of
    ):
        """Scoring docs OUTSIDE the fitted pool (incremental scoring):
        a gram unseen in both corpora contributes the true smoothed
        log((raw_total+sB)/(tgt_total+sB)), not 0."""
        tc, rc = Counter(), Counter()
        for t in TARGET:
            tc.update(bucket_of[g] for g in _grams(t))
        for _, t in RAW:
            rc.update(bucket_of[g] for g in _grams(t))
        t_total, r_total = sum(tc.values()), sum(rc.values())
        new = spark.createDataFrame(
            pd.DataFrame({"doc_id": ["x1"], "text": ["zzqx vvkw bbnm"]})
        )
        got = selection.dsir_log_weights(new, ratios, buckets=B).collect()[0]
        lr = {r["bucket"]: r["log_ratio"] for r in ratios.collect()}
        grams = _grams("zzqx vvkw bbnm")
        bx = {
            r["g"]: r["b"]
            for r in spark.createDataFrame(pd.DataFrame({"g": grams}))
            .select("g", F.pmod(F.xxhash64("g"), F.lit(B)).alias("b"))
            .collect()
        }
        exp = sum(lr[bx[g]] for g in grams)
        assert got["log_weight"] == pytest.approx(exp, abs=1e-5)
        # sanity: at least the genuinely-unseen buckets carry the
        # constant, not zero (totals differ in this fixture)
        const = math.log(r_total + SMOOTH * B) - math.log(t_total + SMOOTH * B)
        unseen = [b for b in range(B) if b not in tc and b not in rc]
        assert unseen and all(
            lr[b] == pytest.approx(const, abs=1e-9) for b in unseen
        )

    def test_featureless_doc_survives_with_weight_zero(self, spark, ratios):
        empty = spark.createDataFrame(
            pd.DataFrame({"doc_id": ["e1"], "text": ["   "]})
        )
        got = selection.dsir_log_weights(empty, ratios, buckets=B).collect()[0]
        assert got["n_features"] == 0 and got["log_weight"] == 0.0
        picked = selection.dsir_resample(empty, ratios, k=1, buckets=B).collect()
        assert [r["doc_id"] for r in picked] == ["e1"]

    def test_on_target_weighs_more(self, raw_df, ratios):
        w = {
            r["doc_id"]: r["log_weight"]
            for r in selection.dsir_log_weights(raw_df, ratios, buckets=B).collect()
        }
        assert min(w["r1"], w["r2"]) > w["r5"] > max(w["r3"], w["r4"], w["r6"])


class TestResample:
    def test_cold_temperature_is_topk_by_weight(self, raw_df, ratios):
        picked = {
            r["doc_id"]
            for r in selection.dsir_resample(
                raw_df, ratios, k=2, buckets=B, temperature=1e-6
            ).collect()
        }
        assert picked == {"r1", "r2"}

    def test_deterministic_in_seed(self, raw_df, ratios):
        a = {
            r["doc_id"]
            for r in selection.dsir_resample(
                raw_df, ratios, k=3, buckets=B, seed=7
            ).collect()
        }
        b = {
            r["doc_id"]
            for r in selection.dsir_resample(
                raw_df, ratios, k=3, buckets=B, seed=7
            ).collect()
        }
        assert a == b

    def test_gumbel_matches_reference(self, spark, raw_df, ratios):
        """The selection key is exactly log_weight/T + gumbel(hash):
        recompute both halves independently and compare the pick."""
        w = {
            r["doc_id"]: r["log_weight"]
            for r in selection.dsir_log_weights(raw_df, ratios, buckets=B).collect()
        }
        ids = sorted(w)
        h = {
            r["doc_id"]: r["h"]
            for r in spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
            .select("doc_id", F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(1 << 53)).alias("h"))
            .collect()
        }
        def key(d):
            u = (h[d] + 0.5) / float(1 << 53)
            return w[d] + -math.log(-math.log(u))
        exp = set(sorted(ids, key=key, reverse=True)[:3])
        got = {
            r["doc_id"]
            for r in selection.dsir_resample(
                raw_df, ratios, k=3, buckets=B, seed=7
            ).collect()
        }
        assert got == exp

    def test_validation(self, raw_df, ratios):
        with pytest.raises(ValueError):
            selection.dsir_resample(raw_df, ratios, k=0, buckets=B)
        with pytest.raises(ValueError):
            selection.dsir_resample(raw_df, ratios, k=1, buckets=B, temperature=0)
        with pytest.raises(ValueError):
            selection.hashed_feature_rows(raw_df, buckets=1)


class TestPlanQuality:
    def test_pure_sql_and_takeordered(self, raw_df, ratios):
        df = selection.dsir_resample(raw_df, ratios, k=2, buckets=B)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
