"""Regressions for the storage/engine review pass (round 3).

Each test pins one reviewed defect: compaction schema loss, the
case-insensitive time-injection miss, fast-path shape matching,
qualified time predicates, snapshot staleness after retention,
hot-tier invalidation, and tz-aware scan bounds.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from parseable_spark.ingest.events import StreamConfig
from parseable_spark.query.engine import QueryEngine, references_time_col
from parseable_spark.storage.store import StreamStore


@pytest.fixture()
def store(spark, tmp_path):
    return StreamStore(spark, str(tmp_path), StreamConfig(name="s1"))


def test_compact_preserves_evolved_columns(spark, store):
    """Files written before a schema-evolution step lack the new column;
    compaction must null it, not DROP it from the rewrite."""
    ts = datetime(2026, 8, 1, 12, 0, 0)
    store.ingest([{"a": 1.0}], p_timestamp=ts)
    store.flush()
    store.ingest([{"a": 2.0, "b": "late-column"}], p_timestamp=ts)
    store.flush()  # same minute dir → two files, drifted schemas
    assert store.compact(min_files=2) == 1
    rows = {r["a"]: r["b"] for r in store.scan().select("a", "b").collect()}
    assert rows == {1.0: None, 2.0: "late-column"}


def test_time_injection_is_case_insensitive(spark, store):
    """FROM APP must get the window filter for registered stream 'app'
    (Spark resolves the view case-insensitively; the injection lookup
    must not be stricter)."""
    ts = datetime(2026, 8, 1, 12, 0, 0)
    store.ingest([{"v": 1.0}], p_timestamp=ts)
    store.flush()
    eng = QueryEngine(spark)
    eng.register_stream("app_ci", store.scan())
    out = eng.query(
        "SELECT count(*) AS n FROM APP_CI",
        "2027-01-01T00:00:00Z",
        "2027-01-02T00:00:00Z",  # window excludes the 2026 row
    )
    assert out.collect()[0]["n"] == 0


def test_bare_count_shape_is_exact(spark, store):
    """COUNT(*) * 2 and COUNT(*) FILTER (...) contain count(1) but must
    NOT take the manifest fast path."""
    ts = datetime(2026, 8, 1, 12, 0, 0)
    store.ingest([{"v": float(i)} for i in range(6)], p_timestamp=ts)
    store.flush()
    eng = QueryEngine(spark)
    eng.register_stream("cnt_s", store.scan())
    assert eng.detect_bare_count("SELECT COUNT(*) AS n FROM cnt_s") == ("cnt_s", "n")
    assert eng.detect_bare_count("SELECT COUNT(*) * 2 AS n FROM cnt_s") is None
    assert (
        eng.detect_bare_count(
            "SELECT COUNT(*) FILTER (WHERE v > 3) AS n FROM cnt_s"
        )
        is None
    )


def test_qualified_time_predicate_counts_as_constraint():
    assert references_time_col("SELECT * FROM s WHERE s.p_timestamp >= 'x'", "p_timestamp")
    assert references_time_col("SELECT * FROM s WHERE p_timestamp >= 'x'", "p_timestamp")
    # a bare mention (DATE_BIN arg) still does not count
    assert not references_time_col(
        "SELECT date_bin('1 hour', p_timestamp) FROM s", "p_timestamp"
    )
    # and a different identifier with the name as a suffix never matches
    assert not references_time_col("WHERE xp_timestamp >= 'x'", "p_timestamp")


def test_retention_rebuilds_snapshot_and_invalidates_hot_tier(spark, tmp_path):
    import json as _json
    import os

    from parseable_spark.storage.hottier import HotTier

    store = StreamStore(spark, str(tmp_path), StreamConfig(name="s2"))
    old = datetime(2026, 1, 1, 0, 0, 0)
    new = datetime(2026, 8, 1, 0, 0, 0)
    store.ingest([{"v": 1.0}], p_timestamp=old)
    store.flush()
    store.ingest([{"v": 2.0}], p_timestamp=new)
    store.flush()
    store.hot_tier = HotTier(
        cache_dir=os.path.join(store.stream_dir, "ht"), size_limit=10**9
    )
    for f in store.manifest.files:
        store.hot_tier.add(f.file_path)
    assert len(store.hot_tier._sizes) == 2

    removed = store.apply_retention(days=30, now=new + timedelta(days=1))
    assert removed == 1
    # snapshot now matches the post-retention manifest exactly
    snap = _json.load(open(store.snapshot_path))
    assert sum(m["events_ingested"] for m in snap["items"]) == 1
    # the dead file's hot-tier copy is gone; the live one remains
    assert len(store.hot_tier._sizes) == 1


def test_scan_accepts_tz_aware_bounds(spark, store):
    ts = datetime(2026, 8, 1, 12, 0, 0)
    store.ingest([{"v": 1.0}], p_timestamp=ts)
    store.flush()
    aware = lambda d: d.replace(tzinfo=timezone.utc)  # noqa: E731
    out = store.scan(
        start=aware(ts - timedelta(hours=1)), end=aware(ts + timedelta(hours=1))
    )
    assert out.count() == 1
    # offset zones normalize to the UTC axis, not their wall time
    ist = timezone(timedelta(hours=5, minutes=30))
    out2 = store.scan(
        start=(ts - timedelta(hours=1)).replace(tzinfo=timezone.utc).astimezone(ist),
        end=(ts + timedelta(hours=1)).replace(tzinfo=timezone.utc).astimezone(ist),
    )
    assert out2.count() == 1


def test_fast_count_windowed(spark, tmp_path):
    """Code-review regression: a windowed bare COUNT(*) must sum only
    fully-contained files (+ in-window staging), never the all-time
    total; boundary-straddling files force a real scan."""
    from parseable_spark.query.counts import fast_count
    from parseable_spark.query.engine import QueryEngine

    store = StreamStore(spark, str(tmp_path), StreamConfig(name="fcw"))
    t1 = datetime(2026, 8, 1, 10, 0, 0)
    t2 = datetime(2026, 8, 1, 11, 0, 0)
    store.ingest([{"v": 1.0}, {"v": 2.0}], p_timestamp=t1)
    store.flush()
    store.ingest([{"v": 3.0}], p_timestamp=t2)
    store.flush()
    store.ingest([{"v": 4.0}], p_timestamp=t2 + timedelta(minutes=1))  # staging

    eng = QueryEngine(spark)
    eng.register_stream("fcw", store.scan())
    sql = "SELECT COUNT(*) AS n FROM fcw"
    stores = {"fcw": store}
    # all-time: 4 (3 flushed + 1 staging)
    assert fast_count(eng, sql, stores).collect()[0]["n"] == 4
    # window containing only the first file
    out = fast_count(
        eng, sql, stores, start=t1 - timedelta(hours=1), end=t1 + timedelta(minutes=30)
    )
    assert out.collect()[0]["n"] == 2
    # window containing the second file + the staging row
    out = fast_count(
        eng, sql, stores, start=t2 - timedelta(minutes=1), end=t2 + timedelta(hours=1)
    )
    assert out.collect()[0]["n"] == 2
    # window slicing through file 1 → must scan (None)
    assert (
        fast_count(eng, sql, stores, start=t1, end=t1 + timedelta(microseconds=1))
        is None
        or fast_count(
            eng, sql, stores, start=t1, end=t1 + timedelta(microseconds=1)
        ).collect()[0]["n"] == 2
    )


class TestHotTierFileLifetime:
    """r5 review: evicted/invalidated cache copies must outlive
    in-flight queries (grace), and a crash mid-copy must not leave a
    truncated parquet that __post_init__ re-registers."""

    def _tier(self, tmp_path, limit=1000):
        from parseable_spark.storage.hottier import HotTier

        return HotTier(cache_dir=str(tmp_path / "ht"), size_limit=limit)

    def _remote(self, tmp_path, name, size):
        p = tmp_path / "remote" / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x" * size)
        return str(p)

    def test_eviction_defers_physical_delete(self, tmp_path):
        import os

        tier = self._tier(tmp_path, limit=1000)
        a = tier.add(self._remote(tmp_path, "date=2026-08-01/a.parquet", 600))
        assert a is not None
        # b forces eviction of a (oldest) — a must STAY readable
        b = tier.add(self._remote(tmp_path, "date=2026-08-02/b.parquet", 600))
        assert b is not None
        assert tier.lookup(
            self._remote(tmp_path, "date=2026-08-01/a.parquet", 600)
        ) is None  # logically evicted (quota freed)
        assert os.path.exists(a), "evicted copy deleted inline — in-flight reads break"
        # past the grace, a reap pass removes it
        tier._graveyard = [(p, 0.0) for p, _ in tier._graveyard]
        with tier._mu:
            tier._reap_graveyard()
        assert not os.path.exists(a)

    def test_invalidate_defers_physical_delete(self, tmp_path):
        import os

        tier = self._tier(tmp_path)
        r = self._remote(tmp_path, "date=2026-08-01/a.parquet", 100)
        local = tier.add(r)
        tier.invalidate(r)
        assert tier.lookup(r) is None
        assert os.path.exists(local)

    def test_readd_during_grace_cancels_pending_delete(self, tmp_path):
        import os

        tier = self._tier(tmp_path)
        r = self._remote(tmp_path, "date=2026-08-01/a.parquet", 100)
        local = tier.add(r)
        tier.invalidate(r)
        # re-add before the grace expires: same local path, fresh copy
        assert tier.add(r) == local
        tier._graveyard = [(p, 0.0) for p, _ in tier._graveyard]
        with tier._mu:
            tier._reap_graveyard()
        assert os.path.exists(local), "reap deleted a re-added live copy"
        assert tier.lookup(r) == local

    def test_boot_cleans_partial_copies(self, tmp_path):
        import os

        from parseable_spark.storage.hottier import HotTier

        cache = tmp_path / "ht"
        (cache / "date=2026-08-01").mkdir(parents=True)
        partial = cache / "date=2026-08-01" / "a.parquet.tmp-ht"
        partial.write_bytes(b"trunc")  # crash mid-copy leftover
        tier = HotTier(cache_dir=str(cache), size_limit=1000)
        assert not os.path.exists(partial)
        assert tier.used_bytes() == 0  # never registered


class TestRetentionGrace:
    def test_retention_tombstones_then_reaps(self, spark, tmp_path):
        """Expired partitions vanish from the manifest immediately but
        stay on disk for the grace window (in-flight queries hold
        resolved paths); the reap pass deletes them and prunes dirs."""
        import os
        from datetime import datetime

        from parseable_spark.ingest.events import StreamConfig
        from parseable_spark.storage.store import StreamStore

        store = StreamStore(spark, str(tmp_path), StreamConfig(name="rg"))
        store.ingest([{"a": 1}], p_timestamp=datetime(2024, 1, 1, 10))
        store.flush()
        store.ingest([{"a": 2}], p_timestamp=datetime(2024, 3, 1, 10))
        store.flush()
        old_files = [
            f.file_path
            for f in store.manifest.files
            if "date=2024-01-01" in f.file_path
        ]
        assert old_files
        removed = store.apply_retention(30, now=datetime(2024, 3, 10))
        assert removed == 1
        assert len(store.manifest.files) == 1
        assert store.scan().count() == 1  # invisible to readers
        assert all(os.path.exists(p) for p in old_files)  # grace holds
        import threading

        store._reap_tombstones(threading.Lock(), grace_seconds=0.0)
        assert not any(os.path.exists(p) for p in old_files)
        assert not os.path.isdir(os.path.join(store.data_dir, "date=2024-01-01"))

    def test_zero_grace_deletes_inline(self, spark, tmp_path):
        import os
        from datetime import datetime

        from parseable_spark.ingest.events import StreamConfig
        from parseable_spark.storage.store import StreamStore

        store = StreamStore(spark, str(tmp_path), StreamConfig(name="rg0"))
        store.ingest([{"a": 1}], p_timestamp=datetime(2024, 1, 1, 10))
        store.flush()
        store.apply_retention(30, now=datetime(2024, 3, 10), tombstone_grace_seconds=0)
        assert not os.path.isdir(os.path.join(store.data_dir, "date=2024-01-01"))
