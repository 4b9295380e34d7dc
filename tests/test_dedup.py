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


class TestDedupKeepBest:
    """Best-member keep policy: clusters keep the max-score member
    (ties -> min id), singletons keep themselves."""

    def _run(self, spark, rows, pairs, id_type="bigint"):
        from parseable_spark.llm.dedup import dedup_keep_best

        docs = spark.createDataFrame(
            rows, f"doc_id {id_type}, text string, score double"
        )
        p = spark.createDataFrame(pairs, f"id_a {id_type}, id_b {id_type}")
        return {
            r["doc_id"]: (r["cluster_id"], r["is_kept"])
            for r in dedup_keep_best(docs, p, "score").collect()
        }

    def test_keeps_best_scoring_member(self, spark):
        rows = [
            (1, "a", 0.2), (2, "a2", 0.9), (3, "a3", 0.5),  # cluster {1,2,3}
            (4, "b", 0.7),                                   # singleton
            (5, "c", 0.4), (6, "c2", 0.4),                   # tie -> min id
        ]
        got = self._run(spark, rows, [(1, 2), (2, 3), (5, 6)])
        assert got[2] == (1, True) and not got[1][1] and not got[3][1]
        assert got[4] == (4, True)  # singleton keeps itself
        assert got[5][1] and not got[6][1]  # tie broken to min id
        # exactly one keeper per cluster
        by_cluster = {}
        for d, (c, k) in got.items():
            by_cluster.setdefault(c, 0)
            by_cluster[c] += int(k)
        assert all(v == 1 for v in by_cluster.values())

    def test_string_ids(self, spark):
        rows = [("dA", "x", 0.1), ("dB", "x2", 0.8), ("dC", "y", 0.3)]
        got = self._run(spark, rows, [("dA", "dB")], id_type="string")
        assert got["dB"][1] and not got["dA"][1] and got["dC"][1]

    def test_matches_independent_union_find(self, spark):
        """Random-ish graph vs a pure-Python union-find + argmax."""
        import random

        rng = random.Random(7)
        n = 120
        rows = [(i, f"t{i}", round(rng.random(), 6)) for i in range(n)]
        pairs = [
            (a, b)
            for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(80))
            if a != b
        ]
        pairs = [(min(a, b), max(a, b)) for a, b in pairs]
        got = self._run(spark, rows, pairs)
        # reference
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        scores = {i: s for i, _, s in rows}
        clusters: dict[int, list[int]] = {}
        for i in range(n):
            clusters.setdefault(find(i), []).append(i)
        for root, members in clusters.items():
            best = min(members, key=lambda m: (-scores[m], m))
            cid = min(members)
            for m in members:
                assert got[m] == (cid, m == best), (m, got[m])
