"""Tests for the training-pipeline additions: repetition filters,
deterministic hash sampling, contamination check, HLL sketch rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parseable_spark.llm.dedup import contamination
from parseable_spark.llm.sampling import _threshold_hex, hash_sample
from parseable_spark.llm.text import repetition_features


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_features_values(spark):
    df = _docs(
        spark,
        [
            # 4 tokens: "a a a b" -> top word 3/4, distinct 2/4, bigram
            # "a a" appears 2/3 times
            (1, "a a a b"),
            (2, "one two three four five six seven eight nine ten"),  # unique
            (3, "solo"),  # single word: no bigrams -> null frac, gate passes
        ],
    )
    got = {r["doc_id"]: r for r in repetition_features(df).collect()}
    r1 = got[1]
    assert r1["n_words"] == 4
    assert r1["top_word_frac"] == 0.75
    assert r1["dup_word_frac"] == 0.5
    assert r1["top_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert not r1["repetition_ok"]
    r2 = got[2]
    assert r2["top_word_frac"] == 0.1 and r2["dup_word_frac"] == 0.0
    assert r2["repetition_ok"]
    r3 = got[3]
    assert r3["top_bigram_frac"] is None and not r3["repetition_ok"]  # top_word=1


def test_threshold_hex_quantization():
    assert _threshold_hex(0.0) == "00"  # keeps nothing (no prefix < "00")
    assert _threshold_hex(0.5) == "80"
    assert _threshold_hex(0.125) == "20"
    assert _threshold_hex(1.0) == "zz"  # sorts above any hex prefix
    # rates in [255.5/256, 1.0) round to 256 quanta == keep-all; they
    # must hit the "zz" sentinel, NOT format as the 3-char "100" that
    # breaks the 2-char lexicographic compare ("ff" < "100" is False,
    # so rate=0.999 silently kept only the ~6.6% of "0x"/"10" buckets)
    assert _threshold_hex(0.999) == "zz"
    assert _threshold_hex(0.9981) == "zz"
    assert _threshold_hex(0.997) == "ff"  # 255 quanta: still a hex bound
    with pytest.raises(ValueError):
        _threshold_hex(1.5)


def test_hash_sample_near_one_rate_keeps_nearly_everything(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    assert hash_sample(df, rate=0.999, id_col="doc_id").count() == 2000
    # hash_split with a ~0.999 cumulative bound must not shrink train
    from parseable_spark.llm.sampling import hash_split

    split = hash_split(df, {"train": 0.999, "test": 0.001}, id_col="doc_id")
    counts = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    # 0.999 rounds to the full 256 quanta: train absorbs everything
    assert counts.get("train", 0) == 2000


def test_hash_sample_uniform_rate_and_determinism(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    kept = hash_sample(df, rate=0.25, id_col="doc_id")
    n = kept.count()
    assert abs(n / 2000 - 0.25) < 0.05  # hash-uniformity, not RNG
    # deterministic: same rows every run, and nested sampling is monotone
    assert kept.exceptAll(hash_sample(df, rate=0.25, id_col="doc_id")).count() == 0
    wider = hash_sample(df, rate=0.5, id_col="doc_id")
    assert kept.join(wider, "doc_id", "left_anti").count() == 0
    assert hash_sample(df, rate=0.0, id_col="doc_id").count() == 0
    assert hash_sample(df, rate=1.0, id_col="doc_id").count() == 2000


def test_hash_sample_stratified(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "keep").otherwise("drop").alias("grp"),
    )
    got = hash_sample(
        df,
        strata_col="grp",
        strata_rates={"keep": 1.0},
        default_rate=0.0,
        id_col="doc_id",
    )
    assert got.filter("grp = 'drop'").count() == 0
    assert got.filter("grp = 'keep'").count() == 500


def test_hash_sample_arg_validation(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="exactly one"):
        hash_sample(df)
    with pytest.raises(ValueError, match="exactly one"):
        hash_sample(df, rate=0.5, strata_rates={"a": 0.1})
    with pytest.raises(ValueError, match="strata_col"):
        hash_sample(df, strata_rates={"a": 0.1})


def test_contamination_counts_and_broadcast_plan(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    train = _docs(
        spark,
        [
            (1, "saw the quick brown fox yesterday"),  # 2 shared 3-grams
            (2, "completely different words here now"),  # clean
            (3, "quick brown fox jumps high"),  # 2 shared
        ],
    )
    out = contamination(train, bench)
    got = {r["doc_id"]: r["n_contaminated"] for r in out.collect()}
    assert got == {1: 2, 3: 2}  # clean doc 2 absent
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hll_rollup_error_bound(spark, tmp_path):
    """q19 internalizes the ±5% HLL bound as the hash-gated hll_ok
    column (r4); assert it holds and that the exact companion column
    matches an independent COUNT(DISTINCT)."""
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.01"
    rows = {
        r["event_type"]: r
        for r in entry.queries()["q19_sketch_rollups"](spark, sf_dir).collect()
    }
    from parseable_spark.tables import load_table

    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for k, ex in exact.items():
        assert rows[k]["hll_ok"] is True, (k, rows[k])
        assert rows[k]["exact_users"] == ex, (k, rows[k]["exact_users"], ex)


def test_per_group_sample_deterministic_k(spark):
    from parseable_spark.llm.sampling import per_group_sample

    df = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("grp")
    )
    got = per_group_sample(df, k=5, group_col="grp")
    assert got.count() == 15
    assert got.groupBy("grp").count().filter("count != 5").count() == 0
    # reproducible: identical member set on re-run
    again = per_group_sample(df, k=5, group_col="grp").select("doc_id")
    assert got.select("doc_id").exceptAll(again).count() == 0
    # nested: k=2 sample is a prefix of the k=5 sample per group
    two = per_group_sample(df, k=2, group_col="grp").select("doc_id")
    assert two.join(got.select("doc_id"), "doc_id", "left_anti").count() == 0
    with pytest.raises(ValueError, match="k must be"):
        per_group_sample(df, k=0, group_col="grp")


def test_hash_split_disjoint_exhaustive_stable(spark):
    from parseable_spark.llm.sampling import hash_split

    df = spark.range(3000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 3000  # exhaustive, one split per row
    assert abs(counts["train"] / 3000 - 0.8) < 0.03
    assert abs(counts["val"] / 3000 - 0.1) < 0.03
    # stability: same assignment on recompute (leak safety)
    a = out.select("doc_id", "split")
    b = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, {"train": 0.5, "test": 0.1})


def test_pack_sequences_budget_and_determinism(spark):
    from parseable_spark.llm.sampling import pack_sequences

    df = spark.range(400).select(
        F.col("id").alias("doc_id"), (F.col("id") % 700 + 100).alias("toks")
    )
    out = pack_sequences(df, tokens_col="toks", budget=1000, n_shards=8)
    rows = out.collect()
    assert len(rows) == 400  # no rows lost
    assert {r["shard"] for r in rows} <= set(range(8))
    # every batch STARTS under budget: cum before adding the doc < budget
    # equivalently, per (shard,batch): sum(toks) - last_doc_toks < budget
    agg = (
        out.groupBy("shard", "batch_id")
        .agg(F.sum("toks").alias("s"), F.max("toks").alias("m"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in agg:
        # a batch only exceeds budget by (at most) its final document
        assert r["s"] - r["m"] < 1000 or r["n"] == 1
    # deterministic across recomputation
    again = pack_sequences(df, tokens_col="toks", budget=1000, n_shards=8)
    assert out.exceptAll(again).count() == 0
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, tokens_col="toks", budget=0)


def test_tfidf_top_terms_values(spark):
    import math

    from parseable_spark.llm.text import tfidf_top_terms

    df = _docs(
        spark,
        [
            (1, "apple apple banana"),   # apple distinctive (tf=2, df=1)
            (2, "banana cherry cherry"),
            (3, "banana date"),          # banana in all 3 -> idf = ln(1) = 0
        ],
    )
    out = tfidf_top_terms(df, k=2, ndigits=4)
    rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
    top1 = rows[(1, 1)]
    assert top1["term"] == "apple"
    assert top1["tfidf"] == pytest.approx(round(2 * math.log(3 / 1), 4))
    # banana appears in every doc -> tfidf 0, ranks below real keywords
    assert rows[(1, 2)]["term"] == "banana" and rows[(1, 2)]["tfidf"] == 0.0
    assert rows[(2, 1)]["term"] == "cherry"
    assert rows[(3, 1)]["term"] == "date"
    assert all(r["rank"] <= 2 for r in rows.values())


def test_chunk_documents_windows_and_overlap(spark):
    from parseable_spark.llm.text import chunk_documents

    df = _docs(spark, [(1, "w0 w1 w2 w3 w4 w5 w6"), (2, "a b")])
    out = chunk_documents(df, window=4, stride=2)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: starts 0,2,4,6 (every start < 7 words), truncated tails
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 1)]["chunk_text"] == "w2 w3 w4 w5"  # overlap of 2
    assert rows[(1, 2)]["chunk_text"] == "w4 w5 w6"
    assert rows[(1, 3)]["chunk_text"] == "w6"
    assert rows[(1, 2)]["n_tokens"] == 3
    # doc 2 shorter than one window: single chunk
    assert rows[(2, 0)]["chunk_text"] == "a b"
    assert len([k for k in rows if k[0] == 2]) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="window and stride"):
        chunk_documents(df, window=0, stride=2)


def test_kll_rollup_within_rank_error(spark):
    """Merged per-day KLL quantiles must land within a generous rank
    window of the exact distribution (KLL default k=200 ≈ 1.65% rank
    error; q19 asserts ±5% rank in-query via the hash-gated pXX_ok
    booleans — verify them, and verify the exact companions against an
    independent interpolated percentile."""
    import numpy as np

    from parseable_spark.queries.product import q19_sketch_rollups
    from parseable_spark.tables import load_table
    from tests.conftest import SF_SMALL

    rows = {
        r["event_type"]: r for r in q19_sketch_rollups(spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events")
    for etype, row in rows.items():
        vals = np.array(
            sorted(
                r["value"]
                for r in ev.filter(F.col("event_type") == etype).select("value").collect()
            )
        )
        for q in (0.50, 0.95, 0.99):
            assert row[f"p{int(q * 100)}_ok"] is True, (etype, q, row)
            want = round(float(np.quantile(vals, q, method="linear")), 3)
            assert abs(row[f"p{int(q * 100)}_exact"] - want) < 1e-9, (etype, q, row, want)


class TestMixtureSample:
    """Temperature-mixture domain sampling (llm/sampling.mixture_rates
    + mixture_sample)."""

    def test_rates_math(self):
        from parseable_spark.llm.sampling import mixture_rates

        counts = {"web": 8000, "code": 1000, "wiki": 125}
        # T=1: natural proportions → every rate equal (scaled to max 1)
        r1 = mixture_rates(counts, temperature=1.0)
        assert r1 == {"web": 1.0, "code": 1.0, "wiki": 1.0}
        # T=1/3: weights 20/10/5 → raw rates ∝ 20/8000, 10/1000, 5/125;
        # scaled so the most-boosted (wiki) keeps everything
        r3 = mixture_rates(counts, temperature=1 / 3)
        assert r3["wiki"] == 1.0
        assert abs(r3["code"] - (10 / 1000) / (5 / 125)) < 1e-12  # 0.25
        assert abs(r3["web"] - (20 / 8000) / (5 / 125)) < 1e-12  # 0.0625
        # with a row target: expected kept rows ≈ target (capped rates)
        rt = mixture_rates(counts, temperature=1 / 3, target_rows=500)
        expected = sum(rt[d] * counts[d] for d in counts)
        assert abs(expected - 500) < 1.0
        assert all(0.0 <= v <= 1.0 for v in rt.values())
        # zero-count and unlisted domains get rate 0
        assert mixture_rates({"a": 0, "b": 10}, 0.5)["a"] == 0.0

    def test_rates_validation(self):
        import pytest

        from parseable_spark.llm.sampling import mixture_rates

        with pytest.raises(ValueError):
            mixture_rates({"a": 1}, temperature=0.0)
        with pytest.raises(ValueError):
            mixture_rates({"a": -1})
        assert mixture_rates({}) == {}

    def test_mixture_sample_end_to_end(self, spark):
        from pyspark.sql import functions as F

        from parseable_spark.llm.sampling import mixture_rates, mixture_sample

        # skewed synthetic corpus: domain sizes 4096 / 512 / 64
        df = (
            spark.range(4096 + 512 + 64)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") < 4096, "web")
                .when(F.col("id") < 4096 + 512, "code")
                .otherwise("wiki")
                .alias("domain"),
            )
        )
        out = mixture_sample(df, "domain", temperature=0.5)
        got = {
            r["domain"]: r["n"]
            for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
        }
        rates = mixture_rates({"web": 4096, "code": 512, "wiki": 64}, 0.5)
        assert got["wiki"] == 64  # most-boosted domain keeps everything
        # realized fractions track the quantized (/256) rates
        for d, n_dom in (("web", 4096), ("code", 512)):
            want = round(rates[d] * 256) / 256
            assert abs(got[d] / n_dom - want) < 0.05, (d, got[d] / n_dom, want)
        # deterministic: same output on rerun
        again = {
            r["domain"]: r["n"]
            for r in mixture_sample(df, "domain", temperature=0.5)
            .groupBy("domain")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert again == got
        # scan-local data path: no exchange in the filter plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_tfidf_keywords_equals_window_pivot(spark):
    """tfidf_keywords (aggregate top-k) must be value-identical to the
    ROW_NUMBER-window tfidf_top_terms pivot it replaced in q31."""
    from pyspark.sql import functions as F

    from parseable_spark.llm.text import tfidf_keywords, tfidf_top_terms
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    tf3 = tfidf_top_terms(docs, k=3, ndigits=4)
    via_window = tf3.groupBy("doc_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("term"))).alias("kw1"),
        F.max(F.when(F.col("rank") == 2, F.col("term"))).alias("kw2"),
        F.max(F.when(F.col("rank") == 3, F.col("term"))).alias("kw3"),
    )
    a = sorted(map(tuple, via_window.collect()))
    b = sorted(map(tuple, tfidf_keywords(docs, k=3, ndigits=4).collect()))
    assert a == b and len(a) > 0
