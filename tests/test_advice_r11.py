"""Regression pins for the round-10 judge ADVICE findings (fixed r11).

1. medium ann_index.py — legacy centroids.json → parquet codebook
   migration is ATOMIC: while the JSON still exists under its original
   name it is authoritative (a crashed migration's partial codebook/
   dir is discarded and rebuilt), and the migration itself writes into
   codebook.tmp/ + whole-dir rename so a truncated codebook/ is never
   the loadable state.
2. low server.py — trusted-proxy socket comparison canonicalizes
   addresses, so an IPv4 loopback proxy connecting to a dual-stack
   IPv6 listener ('::ffff:127.0.0.1') still matches '127.0.0.1'.
3. low ann_index.py — a cell oversize on global counts whose PULLABLE
   sample is thin (<2 rows; membership mostly in fresh committed
   batches) samples the fresh rows READ-ONLY for the k-means fit
   instead of silently re-skipping the split every compaction.
"""

from __future__ import annotations

import json
import math
import os
import random
from types import SimpleNamespace

import pytest

from parseable_spark.streaming import StreamingEmbeddingIndex

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


class TestAtomicCodebookMigration:
    """ADVICE r10 medium — ann_index.py legacy-JSON migration."""

    def _legacy_nodes(self, rng):
        # a two-level tree: roots 0,1; children 2,3 under 0 — exactly
        # the shape a crashed per-level migration truncates (level=0
        # written, level=1 lost)
        return [
            [0, None, _unit(rng)],
            [1, None, _unit(rng)],
            [2, 0, _unit(rng)],
            [3, 0, _unit(rng)],
        ]

    def _write_legacy(self, base, nodes):
        os.makedirs(base, exist_ok=True)
        with open(os.path.join(base, "centroids.json"), "w") as f:
            json.dump({"nodes": nodes}, f)

    def test_clean_migration(self, spark, tmp_path):
        rng = random.Random(3)
        base = str(tmp_path / "ann")
        nodes = self._legacy_nodes(rng)
        self._write_legacy(base, nodes)
        idx = StreamingEmbeddingIndex(spark, base, n_cells=2)
        assert set(idx._nodes) == {0, 1, 2, 3}
        assert idx._nodes[2]["parent"] == 0
        assert os.path.exists(os.path.join(base, "centroids.json.migrated"))
        assert not os.path.exists(os.path.join(base, "centroids.json"))
        assert not os.path.exists(os.path.join(base, "codebook.tmp"))
        got = {
            (r["cid"], r["level"])
            for r in idx._codebook_df().select("cid", "level").collect()
        }
        assert got == {(0, 0), (1, 0), (2, 1), (3, 1)}

    def test_partial_codebook_from_crashed_migration_is_discarded(
        self, spark, tmp_path
    ):
        """Crash between the level=0 and level=1 appends of a prior
        migration attempt: the JSON (still present — it is renamed
        LAST) must stay authoritative, the truncated codebook/ must be
        rebuilt in full, and no cid may vanish (pre-fix, _load_topology
        trusted any non-empty codebook/ and silently dropped the
        deeper cids, orphaning their historical rows and re-issuing
        their ids)."""
        import pyarrow as pa
        import pyarrow.parquet as papq

        rng = random.Random(5)
        base = str(tmp_path / "ann")
        nodes = self._legacy_nodes(rng)
        self._write_legacy(base, nodes)
        # simulate the crashed attempt: ONLY level=0 landed
        d = os.path.join(base, "codebook", "level=0")
        os.makedirs(d)
        papq.write_table(
            pa.table(
                {
                    "cid": pa.array([0, 1], pa.int64()),
                    "parent": pa.array([None, None], pa.int64()),
                    "v": pa.array(
                        [nodes[0][2], nodes[1][2]], pa.list_(pa.float64())
                    ),
                }
            ),
            os.path.join(d, "part-crashed.parquet"),
        )
        idx = StreamingEmbeddingIndex(spark, base, n_cells=2)
        assert set(idx._nodes) == {0, 1, 2, 3}, (
            "deeper split-child cids must survive a crashed migration"
        )
        got = {
            (r["cid"], r["level"])
            for r in idx._codebook_df().select("cid", "level").collect()
        }
        assert got == {(0, 0), (1, 0), (2, 1), (3, 1)}
        assert not os.path.exists(os.path.join(base, "centroids.json"))
        # next_cid derives from the FULL tree — no reuse of cid 2/3
        assert 1 + max(idx._nodes) == 4

    def test_stale_tmp_dir_from_crash_inside_migration(self, spark, tmp_path):
        """Crash INSIDE the tmp-dir build: leftover codebook.tmp/ is
        wiped and rebuilt; the rename is still whole-dir."""
        rng = random.Random(7)
        base = str(tmp_path / "ann")
        self._write_legacy(base, self._legacy_nodes(rng))
        os.makedirs(os.path.join(base, "codebook.tmp", "level=0"))
        idx = StreamingEmbeddingIndex(spark, base, n_cells=2)
        assert set(idx._nodes) == {0, 1, 2, 3}
        assert not os.path.exists(os.path.join(base, "codebook.tmp"))

    def test_migrated_store_reopens_from_parquet(self, spark, tmp_path):
        rng = random.Random(9)
        base = str(tmp_path / "ann")
        self._write_legacy(base, self._legacy_nodes(rng))
        StreamingEmbeddingIndex(spark, base, n_cells=2)
        idx2 = StreamingEmbeddingIndex(spark, base, n_cells=2)
        assert set(idx2._nodes) == {0, 1, 2, 3}


class TestDualStackProxyCanonicalization:
    """ADVICE r10 low — server.py _canon_ip / _oidc_client_key."""

    def _stub(self, socket_ip):
        return SimpleNamespace(
            headers={"X-Forwarded-For": "203.0.113.9, 198.51.100.7"},
            client_address=(socket_ip, 40000),
        )

    def test_canon_ip(self):
        from parseable_spark.server import _canon_ip

        assert _canon_ip("::ffff:127.0.0.1") == "127.0.0.1"
        assert _canon_ip("::ffff:10.0.0.5") == "10.0.0.5"
        assert _canon_ip("0:0:0:0:0:0:0:1") == "::1"
        assert _canon_ip("127.0.0.1") == "127.0.0.1"
        # non-IP input passes through (never matches, fail-safe)
        assert _canon_ip("not-an-ip") == "not-an-ip"

    def test_mapped_loopback_matches_default_trust_list(self, monkeypatch):
        from parseable_spark.server import _Handler

        monkeypatch.setenv("P_TRUSTED_PROXY", "true")
        monkeypatch.delenv("P_TRUSTED_PROXY_IPS", raising=False)
        # dual-stack listener: the local IPv4 proxy connects as
        # ::ffff:127.0.0.1 — pre-fix this silently fell back to the
        # shared socket-IP bucket
        assert (
            _Handler._oidc_client_key(self._stub("::ffff:127.0.0.1"))
            == "198.51.100.7"
        )

    def test_mapped_configured_ip_matches(self, monkeypatch):
        from parseable_spark.server import _Handler

        monkeypatch.setenv("P_TRUSTED_PROXY", "true")
        monkeypatch.setenv("P_TRUSTED_PROXY_IPS", "10.0.0.5")
        assert (
            _Handler._oidc_client_key(self._stub("::ffff:10.0.0.5"))
            == "198.51.100.7"
        )
        # untrusted addresses still keep the socket bucket
        assert (
            _Handler._oidc_client_key(self._stub("::ffff:192.0.2.50"))
            == "::ffff:192.0.2.50"
        )


class TestThinCellSplitsFromFreshSample:
    """ADVICE r10 low — ann_index.py _split_giant_cells: a cell whose
    membership is mostly in fresh committed batches must still split
    (k-means fit sampled read-only from the fresh rows), not be
    silently re-skipped every compaction."""

    def test_fresh_heavy_cell_splits(self, spark, tmp_path):
        rng = random.Random(11)
        anchor_a = _unit(rng)
        anchor_b = [-x for x in anchor_a]
        idx = StreamingEmbeddingIndex(
            spark,
            str(tmp_path / "ann"),
            n_cells=2,
            threshold=0.999,
            cell_cap=1 << 30,
            split_target=8,
            compact_every=0,
        )
        # batch 0 (the only layer that will merge): ONE row near A,
        # several near B — the pullable sample for A's cell is 1 row
        idx.fold_batch(
            _df(
                spark,
                [(1, _unit(rng, anchor_a, 0.05))]
                + [(10 + i, _unit(rng, anchor_b, 0.05)) for i in range(6)],
            ),
            0,
        )
        # batches 1..3 stay FRESH under keep_recent=3 and flood A's
        # cell well past split_target=8
        for b in (1, 2, 3):
            idx.fold_batch(
                _df(
                    spark,
                    [
                        (100 * b + i, _unit(rng, anchor_a, 0.3))
                        for i in range(8)
                    ],
                ),
                b,
            )
        assert not idx._children  # unsplit so far
        idx.compact_index(keep_recent=3)  # merges only batch 0
        # pre-fix: sample = the single pullable row → split skipped,
        # tree stays flat forever. Post-fix: fresh rows fit the kids.
        assert idx._children, "oversize fresh-heavy cell must split"
        kids = [c for ks in idx._children.values() for c in ks]
        assert len(kids) >= 2
        # nothing lost: every folded row still visible
        assert idx.index_df().count() == 7 + 24
