"""ExactSubstr-style repeated-span dedup (r4).

llm/dedup.py duplicate_spans / strip_duplicate_spans — the fixed-L
distributable variant of the public Lee et al. 2021 ExactSubstr recipe:
corpus-repeated token runs detected via per-doc rolling shingle keys,
merged per document, and stripped from every occurrence."""

from __future__ import annotations

class TestDuplicateSpans:
    """ExactSubstr-style repeated-span dedup (llm/dedup.py
    duplicate_spans / strip_duplicate_spans — Lee et al. 2021 recipe,
    fixed-L distributable variant)."""

    @staticmethod
    def _mk(spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_planted_shared_run_detected_and_merged(self, spark):
        from parseable_spark.llm.dedup import duplicate_spans

        shared = " ".join(f"s{i}" for i in range(30))  # 30-token run
        docs = self._mk(
            spark,
            [
                (1, " ".join(f"a{i}" for i in range(10)) + " " + shared
                    + " " + " ".join(f"b{i}" for i in range(5))),
                (2, shared + " " + " ".join(f"c{i}" for i in range(12))),
                (3, " ".join(f"d{i}" for i in range(40))),  # clean
            ],
        )
        spans = {
            r["doc_id"]: (r["span_start"], r["span_end"])
            for r in duplicate_spans(docs, min_tokens=20).collect()
        }
        # 30-token run, L=20 → 11 overlapping windows merged into ONE
        # span covering exactly the shared tokens
        assert spans == {1: (10, 40), 2: (0, 30)}

    def test_strip_removes_all_occurrences_exactly(self, spark):
        from parseable_spark.llm.dedup import strip_duplicate_spans

        shared = " ".join(f"s{i}" for i in range(25))
        pre1, post1 = "p q r", "x y"
        docs = self._mk(
            spark,
            [(1, f"{pre1} {shared} {post1}"), (2, shared), (3, "u v w")],
        )
        out = {r["doc_id"]: r for r in strip_duplicate_spans(docs, min_tokens=20).collect()}
        assert out[1]["clean_text"] == "p q r x y"
        assert out[1]["n_dup_tokens"] == 25 and out[1]["n_tokens"] == 30
        assert out[2]["clean_text"] == "" and out[2]["dup_token_frac"] == 1.0
        assert out[3]["clean_text"] == "u v w" and out[3]["n_dup_tokens"] == 0

    def test_within_doc_repeat_does_not_trigger(self, spark):
        from parseable_spark.llm.dedup import duplicate_spans

        run = " ".join(f"r{i}" for i in range(20))
        docs = self._mk(spark, [(1, run + " " + run), (2, "z1 z2 z3")])
        assert duplicate_spans(docs, min_tokens=20).count() == 0

    def test_max_copies_tolerance(self, spark):
        from parseable_spark.llm.dedup import duplicate_spans

        run = " ".join(f"t{i}" for i in range(20))
        docs = self._mk(spark, [(i, run) for i in range(1, 4)])
        assert duplicate_spans(docs, min_tokens=20, max_copies=3).count() == 0
        assert duplicate_spans(docs, min_tokens=20, max_copies=2).count() == 3

    def test_short_docs_and_errors(self, spark):
        import pytest

        from parseable_spark.llm.dedup import duplicate_spans, strip_duplicate_spans

        docs = self._mk(spark, [(1, "a b c"), (2, "a b c")])
        assert duplicate_spans(docs, min_tokens=20).count() == 0
        out = strip_duplicate_spans(docs, min_tokens=20).collect()
        assert all(r["clean_text"] == "a b c" for r in out)
        with pytest.raises(ValueError, match="min_tokens"):
            duplicate_spans(docs, min_tokens=1)

    def test_plan_stays_jvm_side(self, spark):
        from parseable_spark.llm.dedup import strip_duplicate_spans

        docs = self._mk(spark, [(1, "a b"), (2, "c d")])
        plan = (
            strip_duplicate_spans(docs, min_tokens=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
