"""Regression pins for the round-9 judge ADVICE findings (fixed r10).

1. medium server.py — X-Forwarded-For honored ONLY from configured
   trusted-proxy socket IPs (P_TRUSTED_PROXY_IPS, default loopback):
   mixed direct+proxied reachability must not let a direct client mint
   per-request eviction buckets.
2. low ann_index.py — first-writer-wins dedup keyed on the per-row
   data-age key ``src`` (original commit batch), not the layer id,
   so tiered cascades can no longer invert "keeps its
   oldest-committed vector".
3. low dedup_index.py — a non-integer ``batch_id=`` dir (Hive default
   partition, leftover junk) is skipped, never aborts a compaction
   cascade.
4. low ann_index.py — _split_giant_cells counts the keep_recent fresh
   committed partitions too (metadata-only), so fresh rows can't
   understate a cell and delay its split.
"""

from __future__ import annotations

import math
import os
import random
from types import SimpleNamespace

import pytest

from parseable_spark.streaming import StreamingDedupIndex, StreamingEmbeddingIndex

DIM = 8


def _unit(rng, anchor=None, noise=0.0):
    if anchor is None:
        v = [rng.gauss(0, 1) for _ in range(DIM)]
    else:
        v = [a + rng.gauss(0, noise) for a in anchor]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, embedding array<double>")


class TestTrustedProxyIPGate:
    """ADVICE r9 medium — server.py:_oidc_client_key."""

    def _stub(self, socket_ip):
        return SimpleNamespace(
            headers={"X-Forwarded-For": "203.0.113.9, 198.51.100.7"},
            client_address=(socket_ip, 40000),
        )

    def test_direct_client_cannot_spoof_forwarded_for(self, monkeypatch):
        from parseable_spark.server import _Handler

        monkeypatch.setenv("P_TRUSTED_PROXY", "true")
        monkeypatch.delenv("P_TRUSTED_PROXY_IPS", raising=False)
        # default trust list is loopback only: an off-host client that
        # reaches the listener directly keeps its socket-IP bucket
        assert (
            _Handler._oidc_client_key(self._stub("192.0.2.50")) == "192.0.2.50"
        )
        # ... while the local reverse proxy's header is honored
        assert (
            _Handler._oidc_client_key(self._stub("127.0.0.1")) == "198.51.100.7"
        )

    def test_explicit_proxy_ip_list(self, monkeypatch):
        from parseable_spark.server import _Handler

        monkeypatch.setenv("P_TRUSTED_PROXY", "true")
        monkeypatch.setenv("P_TRUSTED_PROXY_IPS", "10.0.0.5, 10.0.0.6")
        assert (
            _Handler._oidc_client_key(self._stub("10.0.0.5")) == "198.51.100.7"
        )
        # loopback is NOT implicitly trusted once an explicit list is set
        assert (
            _Handler._oidc_client_key(self._stub("127.0.0.1")) == "127.0.0.1"
        )
        assert (
            _Handler._oidc_client_key(self._stub("192.0.2.50")) == "192.0.2.50"
        )

    def test_no_optin_still_ignores_header(self, monkeypatch):
        from parseable_spark.server import _Handler

        monkeypatch.delenv("P_TRUSTED_PROXY", raising=False)
        monkeypatch.setenv("P_TRUSTED_PROXY_IPS", "127.0.0.1")
        assert (
            _Handler._oidc_client_key(self._stub("127.0.0.1")) == "127.0.0.1"
        )


class TestAnnOldestVectorSurvivesCascade:
    """ADVICE r9 low — ann_index.py first-writer-wins on data age."""

    def test_cascade_keeps_oldest_committed_vector(self, spark, tmp_path):
        rng = random.Random(7)
        vec_a = _unit(rng)
        vec_b = _unit(rng)
        fillers = lambda lo, hi: [  # noqa: E731
            (i, _unit(rng)) for i in range(lo, hi)
        ]
        idx = StreamingEmbeddingIndex(
            spark,
            str(tmp_path / "ann"),
            n_cells=2,
            threshold=0.999,
            max_generations=2,
            merge_fanout=2,
            compact_every=0,
        )
        # batch 0 commits id=1 with vec_a → generation -1
        idx.fold_batch(_df(spark, [(1, vec_a)] + fillers(10, 18)), 0)
        idx.compact_index(keep_recent=0)
        # batch 1 RE-FOLDS id=1 with a different vector → generation -2
        idx.fold_batch(_df(spark, [(1, vec_b)] + fillers(20, 28)), 1)
        idx.compact_index(keep_recent=0)
        gens = [p for p in idx._index_parts() if p < 0]
        assert len(gens) == 2  # no cascade yet (2 <= max_generations)
        # batch 2 (made LARGEST so the size-tiered picker must choose
        # gens -1 and -2) → generation -3 → cascade merges the two
        # smallest; both hold id=1, and the LATER-created gen -2 holds
        # the NEWER vector — layer-id ordering would keep vec_b (the
        # inversion this pin guards against)
        idx.fold_batch(_df(spark, fillers(30, 62)), 2)
        idx.compact_index(keep_recent=0)
        assert any(p < 0 for p in idx._index_parts())
        got = idx.index_df().filter("doc_id = 1").select("v").collect()
        assert len(got) == 1
        assert got[0]["v"] == pytest.approx(vec_a)

    def test_entry_merge_keeps_oldest(self, spark, tmp_path):
        rng = random.Random(9)
        vec_a, vec_b = _unit(rng), _unit(rng)
        idx = StreamingEmbeddingIndex(
            spark, str(tmp_path / "ann"), n_cells=2, compact_every=0
        )
        idx.fold_batch(
            _df(spark, [(1, vec_a)] + [(i, _unit(rng)) for i in range(10, 16)]),
            0,
        )
        idx.fold_batch(
            _df(spark, [(1, vec_b)] + [(i, _unit(rng)) for i in range(20, 26)]),
            1,
        )
        idx.compact_index(keep_recent=0)
        got = idx.index_df().filter("doc_id = 1").select("v").collect()
        assert len(got) == 1
        assert got[0]["v"] == pytest.approx(vec_a)


class TestLexicalOldestTextSurvivesCascade:
    """r10 review (same class as the ANN ADVICE r9 finding): the
    lexical index's layer merges used a bare dropDuplicates — an id
    re-folded with different text kept an ARBITRARY version, and the
    signature and texts stores could even disagree. Both now dedup
    first-writer-wins on the data-age key."""

    def test_texts_and_signatures_keep_oldest_consistently(
        self, spark, tmp_path
    ):
        idx = StreamingDedupIndex(
            spark,
            str(tmp_path / "d"),
            text_shards=4,
            compact_every=0,
            max_generations=2,
            merge_fanout=2,
        )

        def df(rows):
            return spark.createDataFrame(rows, "doc_id bigint, text string")

        text_a = "the original canonical body of document one " * 3
        text_b = "a completely different replacement body here " * 3
        fillers = lambda lo, hi: [  # noqa: E731
            (i, f"unique filler document number {i} " * 4)
            for i in range(lo, hi)
        ]
        idx.process_batch(df([(1, text_a)] + fillers(10, 14)), 0)
        idx.compact_index(keep_recent=0)
        idx.compact_texts(keep_recent=0)
        # batch 1 RE-FOLDS id=1 with different text → its own generation
        idx.process_batch(df([(1, text_b)] + fillers(20, 24)), 1)
        idx.compact_index(keep_recent=0)
        idx.compact_texts(keep_recent=0)
        # larger batch 2 → the cascade must merge the two generations
        # holding id=1 (size-tiered picks the two smallest)
        idx.process_batch(df(fillers(30, 46)), 2)
        idx.compact_index(keep_recent=0)
        idx.compact_texts(keep_recent=0)
        ids = spark.createDataFrame([(1,)], "doc_id bigint")
        got = idx.lookup_texts(ids).collect()
        assert len(got) == 1 and got[0]["text"] == text_a
        # the surviving signature rows for id=1 are batch 0's (text A's
        # bands), consistent with the text the lookup returns
        from parseable_spark.llm.dedup import banded_rows
        from pyspark.sql import functions as F

        want = {
            (r["band_idx"], r["band_hash"])
            for r in banded_rows(df([(1, text_a)])).collect()
        }
        sig = {
            (r["band_idx"], r["band_hash"])
            for r in spark.read.parquet(idx._index_root)
            .filter(F.col("doc_id") == 1)
            .select("band_idx", "band_hash")
            .collect()
        }
        assert sig == want


class TestJunkPartitionDirSkipped:
    """ADVICE r9 low — dedup_index.py compact_texts cascade."""

    def test_compact_texts_survives_hive_default_dir(self, spark, tmp_path):
        idx = StreamingDedupIndex(
            spark, str(tmp_path / "d"), text_shards=4, compact_every=0
        )
        for b in range(3):
            idx.process_batch(
                spark.createDataFrame(
                    [
                        (b * 10 + i, f"document body {b} {i} " * 5)
                        for i in range(4)
                    ],
                    "doc_id bigint, text string",
                ),
                b,
            )
        root = os.path.join(str(tmp_path / "d"), "texts")
        os.makedirs(
            os.path.join(root, "batch_id=__HIVE_DEFAULT_PARTITION__"),
            exist_ok=True,
        )
        # pre-fix: the cascade's bare int() raised ValueError here
        idx.compact_texts(keep_recent=1)
        ids = spark.createDataFrame([(1,), (11,), (21,)], "doc_id bigint")
        assert idx.lookup_texts(ids).count() == 3

    def test_list_batch_ids_skips_junk(self, tmp_path):
        from parseable_spark.streaming.dedup_index import _list_batch_ids

        root = tmp_path / "r"
        for name in (
            "batch_id=3",
            "batch_id=-1",
            "batch_id=__HIVE_DEFAULT_PARTITION__",
            "batch_id=junk",
            "_schema.json.d",
        ):
            os.makedirs(root / name, exist_ok=True)
        assert _list_batch_ids(str(root)) == [-1, 3]


class TestComposedCuratorAtProductionBatchSize:
    """r10 review, found by tools/semantic_batch_probe.py: at 1024-doc
    batches WITH history, the LSH probe's ~1000-literal pushed IN
    overflowed the executor thread stack at runtime (whole-stage
    codegen splits a big In into a chain of methods calling one
    another). in_chunk default is now 512; this pin runs the composed
    pipeline at exactly the size that died."""

    def test_1024_doc_batches_with_history(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from parseable_spark.streaming.curator import StreamingCurator

        def gen(start, n):
            key = F.col("doc_id")
            words = F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.when(i % 4 == 0, F.lit("the")).otherwise(
                    F.substring(F.md5((key * 131 + i).cast("string")), 1, 6)
                ),
            )
            return (
                spark.range(start, start + n)
                .withColumnRenamed("id", "doc_id")
                .withColumn("text", F.concat_ws(" ", words))
            )

        cur = StreamingCurator(
            spark, str(tmp_path / "c"), min_stopword_ratio=0.05,
            near_dup_history=True,
        )
        for b in range(2):
            cur.process_batch(gen(b * 1024, 1024).localCheckpoint(), b)
        kept = cur.kept().count()
        dropped = cur.decisions().count()
        assert kept + dropped == 2048  # exactness holds at this size


class TestSplitCountsFreshPartitions:
    """ADVICE r9 low — _split_giant_cells global size must include the
    keep_recent fresh committed batches (count-only, never pulled)."""

    def test_fresh_rows_trigger_split(self, spark, tmp_path):
        rng = random.Random(13)
        idx = StreamingEmbeddingIndex(
            spark,
            str(tmp_path / "ann"),
            n_cells=1,
            split_target=10,
            compact_every=0,
        )
        idx.fold_batch(_df(spark, [(i, _unit(rng)) for i in range(6)]), 0)
        idx.fold_batch(
            _df(spark, [(i, _unit(rng)) for i in range(10, 16)]), 1
        )
        assert not idx._children  # single root cell, no splits yet
        # merge set = batch 0 only (6 rows ≤ split_target); the 6 fresh
        # rows in kept batch 1 push the cell to 12 > 10 → must split
        idx.compact_index(keep_recent=1)
        assert idx._children, "fresh committed rows must count toward splits"
        # fresh batch 1 is counted but NEVER rewritten (crash discipline)
        assert os.path.isdir(
            os.path.join(idx._index_root, "batch_id=1")
        )
        # rows in the merged generation moved under leaf children
        gens = [p for p in idx._index_parts() if p < 0]
        assert gens
        from pyspark.sql import functions as F

        gen_cells = {
            r["cell"]
            for r in spark.read.parquet(idx._index_root)
            .filter(F.col("batch_id").isin(gens))
            .select("cell")
            .distinct()
            .collect()
        }
        parents = set(idx._children)
        assert not (gen_cells & parents)
