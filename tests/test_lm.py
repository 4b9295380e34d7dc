"""Stupid-backoff n-gram LM (llm/lm.py): training counts and document
scoring pinned against an INDEPENDENT pure-Python implementation
(different code path: dict counters + recursive backoff), plus the
CCNet-style behavioral checks (in-domain docs beat gibberish) and plan
hygiene (pure SQL — no Python eval nodes anywhere).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parseable_spark.llm import lm

ALPHA = 0.4

TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox likes the lazy dog",
    "a quick brown dog jumps over a lazy fox",
    "the lazy dog sleeps while the quick fox jumps",
]
RAW = [
    ("in1", "the quick brown fox jumps over the lazy dog"),  # verbatim in-domain
    ("in2", "the lazy fox jumps over a quick dog"),  # recombined in-domain
    ("oov", "zxqv wkpl mntr zxqv bdfg"),  # pure gibberish
    ("mix", "the quick zxqv fox wkpl over the dog"),  # half OOV
    ("short", "fox"),  # single token: unigram level only
]


def _ref_counts(texts, order):
    c = Counter()
    for t in texts:
        words = t.lower().split()
        for k in range(1, order + 1):
            for i in range(len(words) - k + 1):
                c[" ".join(words[i : i + k])] += 1
    return c


def _ref_score(words, c, order, total, vocab):
    """Independent recursive stupid backoff, longest AVAILABLE context."""

    def s(i, length):
        if length == 1:
            return (c.get(words[i], 0) + 1) / (total + vocab)
        if i - length + 1 < 0:  # not enough history: start lower, no alpha
            return s(i, length - 1)
        gram = " ".join(words[i - length + 1 : i + 1])
        ctx = " ".join(words[i - length + 1 : i])
        if c.get(gram, 0) > 0 and c.get(ctx, 0) > 0:
            return c[gram] / c[ctx]
        return ALPHA * s(i, length - 1)

    return [s(i, order) for i in range(len(words))]


@pytest.fixture(scope="module")
def target_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": [f"t{i}" for i in range(len(TARGET))], "text": TARGET})
    )


@pytest.fixture(scope="module")
def trained(target_df):
    counts = lm.ngram_counts(target_df, order=3).cache()
    yield counts
    counts.unpersist()  # keep the shared session's CacheManager clean


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(pd.DataFrame(RAW, columns=["doc_id", "text"]))


class TestTraining:
    def test_counts_match_reference(self, trained):
        got = {(r["gram"]): (r["n"], r["cnt"]) for r in trained.collect()}
        ref = _ref_counts(TARGET, 3)
        assert {g: c for g, (_, c) in got.items()} == dict(ref)
        for g, (n, _) in got.items():
            assert n == g.count(" ") + 1

    def test_min_count_prunes(self, target_df):
        pruned = lm.ngram_counts(target_df, order=2, min_count=2)
        assert pruned.filter(F.col("cnt") < 2).count() == 0
        # frequent grams survive
        assert pruned.filter(F.col("gram") == "the").count() == 1

    def test_order_validation(self, target_df):
        with pytest.raises(ValueError):
            lm.ngram_counts(target_df, order=0)


class TestScoring:
    def test_scores_match_independent_backoff(self, raw_df, trained):
        c = _ref_counts(TARGET, 3)
        total = sum(v for g, v in c.items() if " " not in g)
        vocab = sum(1 for g in c if " " not in g)
        got = {
            r["doc_id"]: r
            for r in lm.stupid_backoff_scores(raw_df, trained, order=3).collect()
        }
        for doc_id, text in RAW:
            words = text.lower().split()
            ref = _ref_score(words, c, 3, total, vocab)
            exp_ls = sum(math.log10(s) for s in ref) / len(ref)
            row = got[doc_id]
            assert row["n_tokens"] == len(words)
            assert row["log_score"] == pytest.approx(exp_ls, abs=1e-3), doc_id
            assert row["pseudo_ppl"] == pytest.approx(10 ** -exp_ls, rel=1e-3), doc_id

    def test_in_domain_beats_gibberish(self, raw_df, trained):
        got = {
            r["doc_id"]: r["pseudo_ppl"]
            for r in lm.stupid_backoff_scores(raw_df, trained).collect()
        }
        assert got["in1"] < got["mix"] < got["oov"]
        assert got["in2"] < got["oov"]

    def test_perplexity_filter_keeps_clean(self, raw_df, trained):
        scores = {
            r["doc_id"]: r["pseudo_ppl"]
            for r in lm.stupid_backoff_scores(raw_df, trained).collect()
        }
        cut = (scores["mix"] + scores["oov"]) / 2
        kept = lm.perplexity_filter(raw_df, trained, max_ppl=cut)
        ids = {r["doc_id"] for r in kept.collect()}
        assert "oov" not in ids
        assert {"in1", "in2", "mix"} <= ids
        assert "pseudo_ppl" in kept.columns and "text" in kept.columns

    def test_bigram_model_order2(self, raw_df, target_df):
        """Order is a real parameter, not hardcoded trigram plumbing."""
        bi = lm.ngram_counts(target_df, order=2)
        c = _ref_counts(TARGET, 2)
        total = sum(v for g, v in c.items() if " " not in g)
        vocab = sum(1 for g in c if " " not in g)
        got = {
            r["doc_id"]: r
            for r in lm.stupid_backoff_scores(raw_df, bi, order=2).collect()
        }
        words = RAW[1][1].split()
        ref = _ref_score(words, c, 2, total, vocab)
        exp_ls = sum(math.log10(s) for s in ref) / len(ref)
        assert got["in2"]["log_score"] == pytest.approx(exp_ls, abs=1e-3)


class TestPlanQuality:
    def test_pure_sql_plan(self, raw_df, trained):
        plan = (
            lm.stupid_backoff_scores(raw_df, trained)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan
        assert "MapInPandas" not in plan
