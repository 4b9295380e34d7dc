"""Regression pins for the round-8 judge ADVICE findings (fixed r9).

1 medium: the curator's semantic stage must derive each id's vector
from the SAME row stage 1.5 keeps as canonical text (min-text), not an
independent max-over-arrays pick that can belong to a dropped
duplicate.
4 low: in-batch semantic near-dups detected (self-join over the cell
assignments, flood-guarded); OIDC per-client cap configurable +
trusted forwarded-for opt-in; cell-split sampling decorrelated from
arrival order; Iceberg orphan-sweep grace raised + single-writer
contract stated.
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest

# quality-passing texts (≥5 words, ≥64 chars, stopwords) with NO
# shingle overlap between any two, so the lexical gates never fire and
# the semantic stage is the only near-dup path under test
TXT_A = (
    "an auburn fox leaps across that sleepy canine before a weary hound "
    "rests beside some glowing hearth through a silent evening"
)
TXT_B = (
    "seven sailors charted the northern strait and every map they drew "
    "marked the hidden reef beneath the cold grey water near the shore"
)
TXT_C = (
    "beneath crumbling arches the old librarian sorted forgotten atlases "
    "while rain tapped gently on the high windows of the reading room"
)
TXT_D = (
    "bright kites tangled in autumn wind over the harbor as children "
    "raced along the pier counting gulls that wheeled above the masts"
)
TXT_E = (
    "deep in the mine the lanterns flickered and the foreman listened "
    "for the slow drip of water that marked the flooded lower gallery"
)
TXT_F = (
    "the committee debated the irrigation budget for hours until someone "
    "proposed splitting the reservoir works into two separate phases"
)
TXT_Z = (
    "zealous engineers rebuilt the ancient aqueduct spanning wide misty "
    "gorges carrying mountain meltwater toward distant thirsty villages"
)


def _vec(axis: int, dim: int = 8, eps: float = 0.0):
    v = [0.0] * dim
    v[axis] = 1.0
    if eps:
        v[(axis + 1) % dim] = eps
        n = (1 + eps * eps) ** 0.5
        v = [x / n for x in v]
    return v


SCH = "doc_id bigint, text string, embedding array<double>"


class TestSemanticVectorFromWinningRow:
    """ADVICE r8 medium — curator.py: the folded/probed vector must
    come from the row whose text stage 1.5 keeps."""

    def test_vector_matches_min_text_row(self, spark, tmp_path):
        from parseable_spark.streaming import StreamingCurator

        cur = StreamingCurator(
            spark, str(tmp_path / "c"),
            semantic_dup_history=True, ann_n_cells=2,
            num_shards=4, bits_per_shard=1 << 14,
        )
        # id 1 arrives twice with DIFFERENT texts: stage 1.5 keeps the
        # min text (TXT_A < TXT_Z); the indexed vector must belong to
        # that same row (axis 0), not the max-array pick (axis 3)
        b0 = spark.createDataFrame(
            [(1, TXT_A, _vec(0)), (1, TXT_Z, _vec(3))], SCH
        )
        cur.process_batch(b0, 0)
        kept = {r["doc_id"]: r["text"] for r in cur.kept().collect()}
        assert kept == {1: TXT_A}
        [row] = cur.ann.index_df().collect()
        assert row["doc_id"] == 1
        assert row["v"][0] == pytest.approx(1.0)  # TXT_A's vector
        # a later paraphrase of the KEPT text's vector is caught...
        cur.process_batch(
            spark.createDataFrame([(5, TXT_B, _vec(0, eps=0.02))], SCH), 1
        )
        reasons = {
            r["doc_id"]: r["reason"] for r in cur.decisions().collect()
        }
        assert reasons.get(5) == "near_duplicate_semantic"
        # ...and a near-copy of the DROPPED duplicate's vector is not
        cur.process_batch(
            spark.createDataFrame([(6, TXT_C, _vec(3, eps=0.02))], SCH), 2
        )
        assert 6 in {r["doc_id"] for r in cur.kept().collect()}

    def test_null_and_real_embedding_tie_prefers_real(self, spark, tmp_path):
        """Among rows tied on the canonical text, a non-NULL embedding
        wins (a NULL would needlessly bypass the semantic stage)."""
        from parseable_spark.streaming import StreamingCurator

        cur = StreamingCurator(
            spark, str(tmp_path / "c"),
            semantic_dup_history=True, ann_n_cells=2,
            num_shards=4, bits_per_shard=1 << 14,
        )
        b0 = spark.createDataFrame(
            [(1, TXT_A, None), (1, TXT_A, _vec(2))], SCH
        )
        cur.process_batch(b0, 0)
        [row] = cur.ann.index_df().collect()
        assert row["doc_id"] == 1 and row["v"][2] == pytest.approx(1.0)


class TestInBatchSemanticNearDups:
    """ADVICE r8 low — two paraphrases in the SAME micro-batch: one
    drops (min-id canonical survives), reason near_duplicate_semantic."""

    def test_same_batch_paraphrases_one_kept(self, spark, tmp_path):
        from parseable_spark.streaming import StreamingCurator

        cur = StreamingCurator(
            spark, str(tmp_path / "c"),
            semantic_dup_history=True, ann_n_cells=2,
            num_shards=4, bits_per_shard=1 << 14,
        )
        b0 = spark.createDataFrame(
            [
                (1, TXT_A, _vec(0)),
                (2, TXT_B, _vec(0, eps=0.03)),  # paraphrase of 1, same batch
                (3, TXT_C, _vec(4)),  # orthogonal — survives
            ],
            SCH,
        )
        cur.process_batch(b0, 0)
        kept = {r["doc_id"] for r in cur.kept().collect()}
        assert kept == {1, 3}
        reasons = {
            r["doc_id"]: r["reason"] for r in cur.decisions().collect()
        }
        assert reasons == {2: "near_duplicate_semantic"}
        # survivors-only fold: the in-batch loser never reaches the index
        indexed = {r["doc_id"] for r in cur.ann.index_df().collect()}
        assert indexed == {1, 3}
        # replay is idempotent
        cur.process_batch(b0, 0)
        assert {r["doc_id"] for r in cur.kept().collect()} == kept
        assert {
            r["doc_id"]: r["reason"] for r in cur.decisions().collect()
        } == reasons

    def test_null_embeddings_bypass_in_batch_stage(self, spark, tmp_path):
        from parseable_spark.streaming import StreamingCurator

        cur = StreamingCurator(
            spark, str(tmp_path / "c"),
            semantic_dup_history=True, ann_n_cells=2,
            num_shards=4, bits_per_shard=1 << 14,
        )
        b0 = spark.createDataFrame(
            [(1, TXT_A, None), (2, TXT_B, None)], SCH
        )
        cur.process_batch(b0, 0)
        assert {r["doc_id"] for r in cur.kept().collect()} == {1, 2}

    def test_in_batch_flood_guarded_by_representative(self, spark, tmp_path):
        """An in-batch flood of identical vectors in one cell past
        cell_cap participates only via the min-id representative —
        bounded pairs, and exactly the representative survives."""
        from parseable_spark.streaming import StreamingCurator

        cur = StreamingCurator(
            spark, str(tmp_path / "c"),
            semantic_dup_history=True, ann_n_cells=2,
            num_shards=4, bits_per_shard=1 << 14,
        )
        cur.ann.cell_cap = 2  # force the guard for a 6-doc flood
        texts = [TXT_A, TXT_B, TXT_C, TXT_D, TXT_E, TXT_F]
        b0 = spark.createDataFrame(
            [(i, texts[i], _vec(0)) for i in range(6)], SCH
        )
        cur.process_batch(b0, 0)
        kept = {r["doc_id"] for r in cur.kept().collect()}
        assert kept == {0}  # min-id representative survives
        reasons = {r["reason"] for r in cur.decisions().collect()}
        assert reasons == {"near_duplicate_semantic"}


class TestSplitSamplingDecorrelated:
    """ADVICE r8 low — ann_index.py: split sampling ordered by a hash
    of the id, not the id itself (ids correlate with arrival time)."""

    def test_drifted_cell_splits_despite_old_head(self, spark, tmp_path):
        """First 2500 ids (the 'oldest' slice, > the 2048 sample cap)
        are ONE identical vector; the newer 2500 are another. Sampling
        by raw id order would fit children on the identical head only
        (degenerate split, reverted — the cell stays frozen); hash-
        ordered sampling mixes both eras and the split separates them."""
        from pyspark.sql import functions as F

        from parseable_spark.streaming.ann_index import (
            StreamingEmbeddingIndex,
        )

        idx = StreamingEmbeddingIndex(
            spark, str(tmp_path / "ann"), n_cells=1, split_target=512,
            compact_every=0,
        )
        rows = [(i, _vec(0, dim=4)) for i in range(2500)] + [
            (i, _vec(2, dim=4)) for i in range(2500, 5000)
        ]
        b = spark.createDataFrame(
            rows, "doc_id bigint, embedding array<double>"
        )
        idx.fold_batch(b, 0)
        idx.compact_index(keep_recent=0)
        leaves = {c for c, _ in idx._centroids}
        assert len(leaves) >= 2  # the split was effective, not reverted
        per_cell = (
            idx.index_df()
            .groupBy("cell")
            .agg(F.collect_set(F.col("v")[0]).alias("x0"))
            .collect()
        )
        for r in per_cell:  # no cell mixes the two eras
            assert len(r["x0"]) == 1


class TestOidcCapConfigurable:
    """ADVICE r8 low — server.py: per-client OIDC cap configurable,
    forwarded-for honored only under explicit trusted-proxy opt-in."""

    def test_env_cap_bounds_pending_states(
        self, spark, tmp_path, monkeypatch
    ):
        from parseable_spark.server import ParseableAPI

        api = ParseableAPI(spark, str(tmp_path))
        monkeypatch.setenv("P_OIDC_STATES_PER_CLIENT", "2")
        s1 = api.mint_oidc_state("/a", client="10.0.0.1")
        s2 = api.mint_oidc_state("/b", client="10.0.0.1")
        s3 = api.mint_oidc_state("/c", client="10.0.0.1")
        assert api.consume_oidc_state(s1) is None  # evicted at cap 2
        assert api.consume_oidc_state(s2) == "/b"
        assert api.consume_oidc_state(s3) == "/c"

    def test_forwarded_for_requires_optin(self, monkeypatch):
        from parseable_spark.server import _Handler

        stub = SimpleNamespace(
            headers={"X-Forwarded-For": "203.0.113.9, 198.51.100.7"},
            client_address=("127.0.0.1", 40000),
        )
        monkeypatch.delenv("P_TRUSTED_PROXY", raising=False)
        # default (direct-serve): attacker-controlled header ignored
        assert _Handler._oidc_client_key(stub) == "127.0.0.1"
        # explicit opt-in: the proxy-appended (rightmost) hop is used
        monkeypatch.setenv("P_TRUSTED_PROXY", "true")
        assert _Handler._oidc_client_key(stub) == "198.51.100.7"
        stub.headers = {}
        assert _Handler._oidc_client_key(stub) == "127.0.0.1"


class TestIcebergOrphanGrace:
    """ADVICE r8 low — iceberg.py: sweep grace far above any plausible
    commit duration; single-writer contract stated on the class."""

    def test_grace_default_hours_and_override(self, tmp_path):
        from parseable_spark.storage.iceberg import IcebergMirror

        m = IcebergMirror(str(tmp_path / "t"))
        assert m._ORPHAN_GRACE_S >= 6 * 3600
        m2 = IcebergMirror(str(tmp_path / "t2"), orphan_grace_s=60.0)
        assert m2._ORPHAN_GRACE_S == 60.0
        assert "single-writer" in (IcebergMirror.__doc__ or "").lower()
