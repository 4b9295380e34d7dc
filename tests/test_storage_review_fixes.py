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
