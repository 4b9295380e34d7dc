"""Round-5 session-7 kernel review fixes: language-ID 'und' fallback,
NaN-cosine guards, LM order validation, log-template flexibility."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


class TestLanguageUnd:
    def test_zero_marker_hits_is_und_not_en(self, spark):
        """Russian/Korean/all-digit text matches no marker word in any
        language; the old tie-at-0 CASE fell through to 'en'."""
        from parseable_spark.llm.text import doc_features, language_id

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "привет мир это русский текст без маркеров",
                        "the quick fox and the lazy dog of the north",
                        "12345 67890 11111 22222 33333",
                    ],
                }
            )
        )
        langs = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
        assert langs[1] == "und" and langs[3] == "und"
        assert langs[2] == "en"
        feats = {r["doc_id"]: r["pred_lang"] for r in doc_features(docs).collect()}
        assert feats == langs  # shared _lang_pred — no divergence


class TestNanCosineGuards:
    def test_zero_vector_never_marks_duplicates(self, spark):
        """A zero-norm embedding gives NaN cosine, which Spark orders
        above every number — it must NOT wholesale-delete its cluster."""
        from parseable_spark.llm.semantic import semantic_dedup

        rows = [
            (0, [0.0] * 8),               # zero vector, min id
            (1, [1.0, 0.2] + [0.0] * 6),
            (2, [0.9, 0.3] + [0.0] * 6),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
        out = {r["vec_id"]: r for r in semantic_dedup(df, k=1, threshold=0.95).collect()}
        # 1 and 2 may legitimately dup each other, but never via id 0
        assert out[1]["dup_of"] != 0 and out[2]["dup_of"] != 0
        assert not out[0]["is_dup"]

    def test_zero_vector_not_a_near_dup_pair(self, spark):
        from parseable_spark.llm.similarity import embedding_near_dups

        rows = [(0, [0.0] * 8), (1, [0.5] * 8), (2, [0.5] * 8)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
        for cap in (None, 64):
            pairs = {
                (r["id_a"], r["id_b"])
                for r in embedding_near_dups(df, threshold=0.9, bucket_cap=cap).collect()
            }
            assert (1, 2) in pairs
            assert all(0 not in p for p in pairs), pairs


class TestLmOrderValidation:
    def test_order_above_trained_raises(self, spark):
        from parseable_spark.llm import lm as L

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["alpha beta gamma delta"]})
        )
        counts = L.ngram_counts(docs, order=2)
        with pytest.raises(ValueError, match="exceeds the LM's trained order"):
            L.stupid_backoff_scores(docs, counts, order=3).collect()
        # default derives the LM's own order — no silent discounting
        got = L.stupid_backoff_scores(docs, counts).collect()
        assert got and got[0]["pseudo_ppl"] > 0


class TestLogTemplatesFlexible:
    def test_custom_msg_without_user_id(self, spark):
        from parseable_spark.llm.text import log_templates

        logs = spark.createDataFrame(
            pd.DataFrame({"line": ["job 12 done in 3 ms", "job 99 done in 7 ms"]})
        )
        out = log_templates(logs, msg_col=F.col("line")).collect()
        assert len(out) == 1 and out[0]["n_events"] == 2
        assert "n_users" not in out[0].asDict()

    def test_user_id_in_group_cols_unambiguous(self, spark):
        from parseable_spark.llm.text import log_templates

        events = spark.createDataFrame(
            pd.DataFrame(
                {
                    "user_id": [1, 1, 2],
                    "event_type": ["a", "a", "a"],
                    "value": [1.0, 2.0, 3.0],
                }
            )
        )
        out = log_templates(events, group_cols=("user_id",)).collect()
        assert {r["user_id"]: r["n_users"] for r in out} == {1: 1, 2: 1}
