"""Round-7 review findings over streaming/curator.py + catalog/
manifest.py — each test pins one verified defect."""

from __future__ import annotations

from datetime import datetime

from parseable_spark.catalog.manifest import FileStats, Manifest


def _fs(path, lo, hi, col="ts", rows=10, extra=None):
    cols = {col: {"min": lo, "max": hi, "nulls": 0}}
    cols.update(extra or {})
    return FileStats(file_path=path, num_rows=rows, file_size=1, columns=cols)


class TestManifestPruning:
    def _man(self):
        m = Manifest()
        for i in range(6):
            m.files.append(
                _fs(
                    f"/d/f{i}.parquet",
                    f"2026-08-0{i + 1}T00:00:00.000000",
                    f"2026-08-0{i + 1}T23:59:59.000000",
                    extra={"status_code": {"min": 200, "max": 503, "nulls": 0}},
                )
            )
        return m

    def test_equals_type_mismatch_keeps_not_crashes(self):
        """A probe value whose type mismatches the stored stats raised
        TypeError out of the PLANNER (r7 review, reproduced). The
        reference drops the stat on mismatch — keep the file."""
        m = self._man()
        got = m.prune_paths("ts", equals={"status_code": "500"})
        assert len(got) == 6  # kept, never pruned unsafely
        assert m.prune_paths("ts", equals={"status_code": None})
        # matching types still prune
        assert m.prune_paths("ts", equals={"status_code": 10_000}) == []

    def test_one_sided_windows_prune(self):
        """`everything since T` / `everything before T` used to bail to
        a full listing (O(history) files); the time index handles
        one-sided bounds."""
        m = self._man()
        since = m.prune_paths("ts", start="2026-08-05T00:00:00.000000")
        assert sorted(since) == ["/d/f4.parquet", "/d/f5.parquet"]
        before = m.prune_paths("ts", end="2026-08-03T00:00:00.000000")
        assert sorted(before) == ["/d/f0.parquet", "/d/f1.parquet"]
        assert len(m.prune_paths("ts")) == 6  # no bounds -> all


class TestCuratorIdIdentity:
    def test_reused_id_with_edited_text_is_dropped(self, spark, tmp_path):
        """doc_id is the document identity: the Bloom gate dedups by
        TEXT, so an id reused with edited text wrote a SECOND canonical
        text for the id — later near-dup verifications against that id
        became nondeterministic (r7 review). The duplicate-id guard
        drops it with its own reason; replays stay idempotent (the
        batch's own texts are excluded from the check)."""
        from parseable_spark.streaming.curator import StreamingCurator

        cur = StreamingCurator(
            spark, str(tmp_path / "c"), near_dup_history=True,
            min_words=1, min_chars=1, min_stopword_ratio=0.0,
        )
        cur.process_batch(
            spark.createDataFrame(
                [(1, "the original canonical body of document one"),
                 (2, "a completely different second document body")],
                "doc_id bigint, text string",
            ),
            0,
        )
        # batch 1 reuses id 1 with EDITED text + brings a fresh id
        cur.process_batch(
            spark.createDataFrame(
                [(1, "the edited re-crawled body of document one"),
                 (3, "an unrelated brand new third document body")],
                "doc_id bigint, text string",
            ),
            1,
        )
        reasons = {r["doc_id"]: r["reason"] for r in cur.decisions().collect()}
        assert reasons.get(1) == "duplicate_id"
        kept = {r["doc_id"] for r in cur.kept().collect()}
        assert kept == {1, 2, 3}
        # exactly ONE canonical text per id in the payload store
        tex = cur.lsh.texts_df().groupBy("doc_id").count().collect()
        assert all(r["count"] == 1 for r in tex)
        # replaying batch 1 must not drop its own docs as duplicates
        cur.process_batch(
            spark.createDataFrame(
                [(1, "the edited re-crawled body of document one"),
                 (3, "an unrelated brand new third document body")],
                "doc_id bigint, text string",
            ),
            1,
        )
        reasons2 = {r["doc_id"]: r["reason"] for r in cur.decisions().collect()}
        assert reasons2 == reasons
        assert {r["doc_id"] for r in cur.kept().collect()} == kept

    def test_in_batch_id_collision_keeps_one_row(self, spark, tmp_path):
        from parseable_spark.streaming.curator import StreamingCurator

        cur = StreamingCurator(
            spark, str(tmp_path / "c2"),
            min_words=1, min_chars=1, min_stopword_ratio=0.0,
        )
        cur.process_batch(
            spark.createDataFrame(
                [(7, "first body with its own words entirely"),
                 (7, "second body sharing the identifier seven")],
                "doc_id bigint, text string",
            ),
            0,
        )
        rows = cur.kept().filter("doc_id = 7").collect()
        assert len(rows) == 1  # one deterministic row per id


class TestCuratorProbeNarrowing:
    def test_pairs_log_holds_only_cross_batch_pairs(self, spark, tmp_path):
        """The curator's stage-5 probe no longer re-emits in-batch
        pairs (stage 4 owns those): the pairs log carries only
        batch↔history candidates (r7 review — the in-batch self-join
        was recomputed and discarded every micro-batch)."""
        from parseable_spark.streaming.curator import StreamingCurator

        base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        texts = [r["text"] for r in base.orderBy("doc_id").limit(10).collect()]
        cur = StreamingCurator(
            spark, str(tmp_path / "c3"), near_dup_history=True,
            min_words=1, min_chars=1, min_stopword_ratio=0.0,
        )
        cur.process_batch(
            spark.createDataFrame(
                [(i, t + f" uniq {i}") for i, t in enumerate(texts)],
                "doc_id bigint, text string",
            ),
            0,
        )
        # batch 1: an in-batch near-dup pair (20, 21) + one history
        # near-dup of doc 0
        cur.process_batch(
            spark.createDataFrame(
                [
                    (20, texts[5] + " uniq twenty tail"),
                    (21, texts[5] + " uniq twenty tail longer"),
                    (22, texts[0] + " uniq 0 extra"),
                ],
                "doc_id bigint, text string",
            ),
            1,
        )
        pairs = {
            (r["id_a"], r["id_b"])
            for r in cur.lsh.candidates().filter("batch_id = 1").collect()
        }
        batch_ids = {20, 21, 22}
        # no pair with BOTH endpoints in the batch (stage 4 territory)
        assert all(
            not ({a, b} <= batch_ids) for a, b in pairs
        ), pairs
        # the history candidate is present (0 is historical)
        assert any(
            ({a, b} & batch_ids) and ({a, b} - batch_ids) for a, b in pairs
        )
        reasons = {r["doc_id"]: r["reason"] for r in cur.decisions().collect()}
        assert reasons.get(22) == "near_duplicate_history"
        assert reasons.get(21) == "near_duplicate"  # stage 4 still works
