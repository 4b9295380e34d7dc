"""End-to-end corpus curation (llm/pipeline.curate_corpus).

A corpus with one planted defect per stage: the audit table must
attribute each planted document to its stage, survivors must be
exactly the clean remainder, PII must be scrubbed from kept text, and
the whole run must be deterministic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parseable_spark.llm.pipeline import REASONS, curate_corpus
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(40)
        .collect()
    )
    texts = [r["text"] for r in base]
    rows = [(i, t) for i, t in enumerate(texts)]
    rows.append((100, texts[0]))  # exact duplicate of doc 0
    rows.append((101, "too short"))  # low quality (n_words < 5)
    # near-dup of 1 (stopword-rich tail so the quality gate still passes)
    rows.append((102, texts[1] + " and the tail is of a kind"))
    # unique text (not a near-dup of anything) carrying PII; its
    # EMBEDDING below is the planted near-copy of vec 3, so only the
    # semantic stage can catch it
    rows.append(
        (
            103,
            "the quarterly incident review covers a storage regression and "
            "the mitigation plan for it in detail; reach me at "
            "alice@example.com with any questions about the rollout notes",
        )
    )
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    # embeddings aligned to doc ids 0..39; make vec 103's embedding a
    # near-copy of vec 3's so the semantic stage has a planted dup
    e3 = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    sem_rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 40).collect()
    ] + [(103, [x * 1.0000001 for x in e3])]
    vecs = spark.createDataFrame(sem_rows, "vec_id bigint, embedding array<double>")
    return df, vecs


def test_each_stage_attributes_its_planted_defect(corpus):
    df, vecs = corpus
    # the synthetic corpus is word-salad (many base docs sit below the
    # default stopword gate), so relax the prose-shaped gates: only the
    # PLANTED defects should trigger in this test
    res = curate_corpus(
        df,
        embeddings=vecs,
        semantic_threshold=0.999999,
        min_stopword_ratio=0.0,
        min_chars=50,
    )
    reasons = {
        r["doc_id"]: r["drop_reason"] for r in res.decisions.collect()
    }
    assert reasons[100] == "exact_duplicate"
    assert reasons[101] == "low_quality"
    assert reasons[102] == "near_duplicate"
    # 103's text is unique, so only its planted embedding catches it
    assert reasons[103] == "semantic_duplicate"
    kept_ids = {r["doc_id"] for r in res.kept.select("doc_id").collect()}
    # every planted doc is gone; survivors are a subset of the base 40.
    # The testdata corpus plants its OWN near-dups (e.g. docs 8 and 12,
    # jaccard 0.97), so base docs may legitimately drop — but only for
    # duplicate reasons, never quality (gates are relaxed above)
    assert kept_ids <= set(range(40)) and {0, 1, 2, 3} <= kept_ids
    base_drop_reasons = {reasons[i] for i in range(40) if reasons[i]}
    assert base_drop_reasons <= {"near_duplicate", "semantic_duplicate"}
    # audit covers every input exactly once, kept ↔ reason-null agree
    assert len(reasons) == df.count()
    assert all(
        (reasons[i] is None) == (i in kept_ids) for i in reasons
    )
    # summary is exactly the decisions table, aggregated
    from collections import Counter

    want = Counter(v or "kept" for v in reasons.values())
    assert res.summary == dict(want)
    assert res.summary["kept"] == len(kept_ids)
    # all reasons are from the documented vocabulary
    assert {v for v in reasons.values() if v} <= set(REASONS)


def test_pii_scrubbed_and_deterministic(corpus):
    df, vecs = corpus
    res = curate_corpus(df, min_stopword_ratio=0.0, min_chars=50)
    kept_text = {
        r["doc_id"]: r["text"] for r in res.kept.collect()
    }
    # 103 survives without embeddings; its email must be redacted
    assert "[EMAIL]" in kept_text[103] and "alice@example.com" not in kept_text[103]
    # determinism: identical kept sets and decisions on a second run
    res2 = curate_corpus(df, min_stopword_ratio=0.0, min_chars=50)
    assert sorted(kept_text) == sorted(
        r["doc_id"] for r in res2.kept.collect()
    )
    assert res.summary == res2.summary


def test_mixture_stage_counts(spark, corpus):
    df, _ = corpus
    domains = df.withColumn(
        "domain", F.when(F.col("doc_id") < 20, "big").otherwise("small")
    )
    res = curate_corpus(
        domains,
        domain_col="domain",
        mixture_target_rows=20,
        min_stopword_ratio=0.0,
        min_chars=50,
    )
    n_kept = res.kept.count()
    assert res.summary["kept"] == n_kept
    assert res.summary.get("mixture_downsampled", 0) > 0
    # decisions for mixture drops carry the right reason
    mix = res.decisions.filter(F.col("drop_reason") == "mixture_downsampled")
    assert mix.count() == res.summary["mixture_downsampled"]


def test_r4_stages_attribute_their_planted_defects(spark, corpus):
    """The three round-4 optional stages in one run: a doc already in
    the history bloom drops as in_history; a gibberish doc drops as
    high_perplexity; a doc sharing a long run with another survivor
    gets the run STRIPPED (rewrite, not drop)."""
    from parseable_spark.llm import bloom, lm
    from parseable_spark.llm.pipeline import curate_corpus

    df, _ = corpus
    geo = dict(num_shards=4, bits_per_shard=1 << 14, num_hashes=5)
    texts = {r["doc_id"]: r["text"] for r in df.collect()}
    # history = doc 5's text was ingested in a previous epoch
    hist = spark.createDataFrame([(0, texts[5])], "doc_id bigint, text string")
    history = bloom.bloom_build(hist, "text", **geo)
    # target-corpus LM over the clean base docs
    lm_counts = lm.ngram_counts(df.filter(F.col("doc_id") < 40), order=2)
    # build the span-dedup pair from IN-VOCABULARY words so the LM
    # stage does not catch them first; pads are disjoint from the run
    # and long enough that pairwise Jaccard stays under the near-dup
    # threshold
    vocab = sorted(
        {w for t in texts.values() for w in t.lower().split()}
    )
    run = " ".join(vocab[:12])
    pad_a = " ".join(vocab[12:21] * 2)
    pad_b = " ".join(vocab[21:30] * 2)
    extra = spark.createDataFrame(
        [
            (  # gibberish long enough (and stopworded) to pass the
                # quality gate, so only the LM can catch it
                200,
                "the zq wv xk jm qq ww vv kk zz xx pp yy bb dd ff gg hh "
                "jj ll mm nn rr ss tt and the vx kq zw pj qv wx yz",
            ),
            (201, f"{pad_a} {run}"),  # shares the 12-token run
            (202, f"{run} {pad_b}"),  # with 201
        ],
        "doc_id bigint, text string",
    )
    res = curate_corpus(
        df.unionByName(extra),
        history_bloom=history,
        bloom_geometry=geo,
        lm_counts=lm_counts,
        max_pseudo_ppl=2000.0,
        strip_spans_min_tokens=10,
        compute_summary=True,
    )
    reasons = {
        r["doc_id"]: r["drop_reason"] for r in res.decisions.collect()
    }
    assert reasons[5] == "in_history"
    assert reasons[200] == "high_perplexity"
    kept_text = {r["doc_id"]: r["text"] for r in res.kept.collect()}
    # the shared 12-token run is stripped from BOTH docs, pads kept
    assert 201 in kept_text and 202 in kept_text
    assert run not in kept_text[201] and run not in kept_text[202]
    assert vocab[12] in kept_text[201] and vocab[21] in kept_text[202]
    assert res.summary.get("in_history", 0) == 1
    # 200 is caught (asserted above); other legitimately OOV-heavy
    # docs (e.g. the prose PII doc vs the word-salad LM) may join it
    assert res.summary.get("high_perplexity", 0) >= 1


def test_r4_stages_off_by_default_is_r3_behavior(corpus):
    """With none of the optional r4 params, the chain is byte-for-byte
    the r3 pipeline (no new stages sneak in)."""
    from parseable_spark.llm.pipeline import curate_corpus

    df, _ = corpus
    res = curate_corpus(df, compute_summary=True)
    assert "in_history" not in res.summary
    assert "high_perplexity" not in res.summary


def test_token_less_survivor_not_silently_dropped(spark):
    """strip_duplicate_spans emits no row for documents with zero
    normalized tokens; the rejoin must be a LEFT join so punctuation-
    only survivors stay in the corpus (as the empty token stream)
    instead of vanishing with no audit entry (ADVICE r4)."""
    from parseable_spark.llm.pipeline import curate_corpus

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu alpha beta gamma delta epsilon zeta"),
        (1, " " * 24),  # whitespace-only: zero normalized tokens
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    res = curate_corpus(
        df,
        min_words=0,
        min_chars=10,
        min_stopword_ratio=0.0,
        strip_spans_min_tokens=5,
        compute_summary=True,
    )
    kept = {r["doc_id"]: r["text"] for r in res.kept.collect()}
    dropped = {
        r["doc_id"] for r in res.decisions.collect() if not r["kept"]
    }
    # every input doc is accounted for exactly once
    assert set(kept) | dropped == {0, 1} and not (set(kept) & dropped)
    assert 1 in kept and kept[1] == ""  # survived as the empty stream


def test_history_bloom_requires_geometry(spark):
    """Probing a history filter under defaulted geometry silently
    defeats the gate (every true duplicate tests definitely-new), so
    curate_corpus must refuse history_bloom without bloom_geometry."""
    from parseable_spark.llm import bloom as B
    from parseable_spark.llm.pipeline import curate_corpus

    df = spark.createDataFrame(
        [(0, "some document text here for the gate")],
        "doc_id bigint, text string",
    )
    geo = {"num_shards": 4, "bits_per_shard": 1 << 12, "num_hashes": 3}
    hist = B.bloom_build(df, "text", **geo)
    with pytest.raises(ValueError, match="bloom_geometry"):
        curate_corpus(df, history_bloom=hist)


def test_near_dup_keep_best_quality(spark):
    """near_dup_keep='best_quality': the cluster's LONGEST member
    survives (RefinedWeb keep policy) instead of the min-id one; the
    default stays min-id so the oracle-gated shape is unchanged."""
    from parseable_spark.llm.pipeline import curate_corpus

    base = (
        "the quick brown fox jumps over the lazy dog and then keeps "
        "running through the meadow for a while longer today"
    )
    rows = [
        (1, base),                                  # short variant, min id
        (2, base + " with an extra tail of useful context appended"),
        (3, base[: len(base) - 10]),                # shortest
        (10, "completely different text about distributed query engines "
             "and how they shuffle data between executors efficiently"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kept_default = {
        r["doc_id"]
        for r in curate_corpus(
            df, min_words=5, min_chars=32, min_stopword_ratio=0.0,
            compute_summary=False,
        ).kept.collect()
    }
    assert 1 in kept_default and 2 not in kept_default  # min-id policy
    res = curate_corpus(
        df, min_words=5, min_chars=32, min_stopword_ratio=0.0,
        near_dup_keep="best_quality", compute_summary=False,
    )
    kept_best = {r["doc_id"] for r in res.kept.collect()}
    assert 2 in kept_best and 1 not in kept_best and 3 not in kept_best
    assert 10 in kept_best
    # drops carry the near_duplicate reason exclusively
    reasons = {
        r["doc_id"]: r["drop_reason"]
        for r in res.decisions.filter("NOT kept").collect()
    }
    assert reasons[1] == "near_duplicate" and reasons[3] == "near_duplicate"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate_corpus(df, near_dup_keep="bogus", compute_summary=False)


class TestR6ReviewGuards:
    def test_invalid_params_raise_before_any_job(self, spark):
        """Entry validation must cost microseconds: a typo'd option on
        a 100 TB corpus must not run the eager LSH stages first. The
        input df RAISES if anything executes it."""
        from parseable_spark.llm.pipeline import curate_corpus

        exploding = spark.range(1).selectExpr(
            "id AS doc_id", "assert_true(false) AS text"
        )
        with pytest.raises(ValueError, match="near_dup_keep"):
            curate_corpus(exploding, near_dup_keep="bogus")
        with pytest.raises(ValueError, match="BOTH lm_counts"):
            curate_corpus(exploding, max_pseudo_ppl=100.0)
        with pytest.raises(ValueError, match="BOTH lm_counts"):
            curate_corpus(exploding, lm_counts=spark.range(1))

    def test_empty_embedding_slice_is_noop_not_crash(self, spark):
        """Zero surviving embedded docs (misaligned ids here) crashed
        k-means with max()-of-empty-sequence."""
        from parseable_spark.llm.pipeline import curate_corpus

        docs = spark.createDataFrame(
            [(i, f"distinct document number {i} " * 3
              + "with the usual long words and filler to pass the gates")
             for i in range(5)],
            "doc_id bigint, text string",
        )
        vecs = spark.createDataFrame(
            [(999 + i, [float(i), 1.0]) for i in range(3)],
            "vec_id bigint, embedding array<double>",
        )
        res = curate_corpus(docs, embeddings=vecs, min_stopword_ratio=0.0)
        assert res.kept.count() >= 1  # pipeline completed, no crash
        assert res.decisions.filter("drop_reason = 'semantic_duplicate'").count() == 0

    def test_kmeans_empty_raises_loudly(self, spark):
        from parseable_spark.llm.semantic import kmeans_fit

        empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
        with pytest.raises(ValueError, match="empty embeddings"):
            kmeans_fit(empty, k=2, id_col="vec_id")

    def test_dsir_smoothing_validated(self, spark):
        from parseable_spark.llm.selection import dsir_log_ratios

        df = spark.createDataFrame([("a b c",)], "text string")
        with pytest.raises(ValueError, match="smoothing"):
            dsir_log_ratios(df, df, smoothing=0.0)

    def test_classifier_empty_and_final_loss(self, spark):
        import math

        from parseable_spark.llm.classifier import logreg_fit

        empty = spark.createDataFrame([], "x double, y double")
        with pytest.raises(ValueError, match="empty training set"):
            logreg_fit(empty, ["x"], "y", iters=1)
        # train_loss is the loss AT the returned weights: recompute it
        # independently from the model's own score column
        df = spark.createDataFrame(
            [(float(i), 1.0 if i > 2 else 0.0) for i in range(6)], "x double, y double"
        )
        m = logreg_fit(df, ["x"], "y", iters=5, lr=0.8)
        z = [m.bias + m.weights[0] * float(i) for i in range(6)]
        ys = [1.0 if i > 2 else 0.0 for i in range(6)]
        want = sum(
            (zi - yi * zi + math.log1p(math.exp(-zi)))
            if zi > 0 else (-yi * zi + math.log1p(math.exp(zi)))
            for zi, yi in zip(z, ys)
        ) / 6
        assert abs(m.train_loss - want) < 1e-9
