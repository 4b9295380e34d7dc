"""Persisted-format versioning/migration (VERDICT r3 next-4).

Reference model: src/migration/mod.rs (boot-time stepwise upgrade),
stream_metadata_migration.rs:1-403 (per-version chain),
store_metadata.rs:46 (CURRENT_STORAGE_METADATA_VERSION). Here: an
r3-layout root (no version fields anywhere) must load, upgrade in
place, and serve queries; every freshly persisted artifact must carry
a version stamp.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

import pytest

from parseable_spark.ingest.events import StreamConfig
from parseable_spark.migration import CURRENT_VERSIONS, stamped, upgrade
from parseable_spark.server import ParseableAPI
from parseable_spark.storage.store import StreamStore


def _strip_versions(root: str) -> list[str]:
    """Rewrite every artifact json under root to its r3 (pre-version)
    shape; returns the rewritten paths."""
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".json"):
                continue
            p = os.path.join(dirpath, fn)
            with open(p) as f:
                obj = json.load(f)
            if not isinstance(obj, dict) or "version" not in obj:
                continue
            obj.pop("version")
            if fn == "retention.json":  # r3 persisted a bare task list
                obj = obj["tasks"]
            with open(p, "w") as f:
                json.dump(obj, f)
            out.append(p)
    return out


def _artifact_jsons(root: str):
    skip: set[str] = set()
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if fn.endswith(".json") and fn not in skip:
                yield os.path.join(dirpath, fn)


def test_upgrade_chain_and_future_rejection():
    up, changed = upgrade("manifest", {"files": []})
    assert changed and up["version"] == f"v{CURRENT_VERSIONS['manifest']}"
    # idempotent on current
    again, changed2 = upgrade("manifest", up)
    assert not changed2 and again == up
    # bare-list retention envelopes
    up, _ = upgrade("retention", [{"action": "delete", "duration": "30d"}])
    assert up["tasks"][0]["action"] == "delete" and up["version"] == "v2"
    # artifacts from the future refuse to load
    with pytest.raises(ValueError, match="newer than supported"):
        upgrade("config", {"version": "v99"})
    # stamped() applies the current envelope
    assert stamped("stats", {})["version"] == f"v{CURRENT_VERSIONS['stats']}"


def test_r3_layout_upgrades_in_place_and_serves(spark, tmp_path):
    root = str(tmp_path / "legacy")
    # build a real store with the current code...
    api = ParseableAPI(spark, root, auth=("admin", "pw"))
    api.create_stream("app")
    store = api._stores["app"]
    base = datetime(2026, 8, 10, 9, 0)
    store.ingest(
        [{"level": "info", "latency_ms": float(i)} for i in range(8)],
        p_timestamp=base,
    )
    store.flush()
    api.put_retention("app", [{"description": "d", "action": "delete", "duration": "30d"}])
    api.create_user("alice", {"grants": [{"privilege": "reader"}], "password": "x"})
    # ...then rewrite every artifact to the r3 (unversioned) shape
    stripped = _strip_versions(root)
    assert stripped, "fixture must contain versioned artifacts to strip"

    # fresh boot over the legacy root: loads, upgrades, serves
    api2 = ParseableAPI(spark, root, auth=("admin", "pw"))
    assert "app" in api2._stores
    assert [u["name"] for u in api2.list_users()] == ["alice"]
    assert api2.get_retention("app")[0]["duration"] == "30d"
    rows = api2.query(
        {
            "query": "SELECT count(*) AS n FROM app",
            "startTime": (base - timedelta(hours=1)).strftime("%Y-%m-%dT%H:%M:%SZ"),
            "endTime": (base + timedelta(hours=1)).strftime("%Y-%m-%dT%H:%M:%SZ"),
        }
    )
    assert rows == [{"n": 8}]
    # the manifest fast path still works through the upgraded manifest
    assert api2._stores["app"].manifest.files, "manifest reloaded"

    # upgrade happened IN PLACE: every artifact now carries a version
    for p in _artifact_jsons(root):
        with open(p) as f:
            obj = json.load(f)
        assert isinstance(obj, dict) and "version" in obj, p


def test_every_persisted_artifact_carries_a_version(spark, tmp_path):
    """Pin: a fresh root's artifacts are all version-stamped at write
    time (the r3 gap — three rounds of formats with no version field)."""
    root = str(tmp_path / "fresh")
    api = ParseableAPI(spark, root, auth=("admin", "pw"))
    api.create_stream(
        "evt", static_schema=False, custom_partition=None, time_partition=None
    )
    st = api._stores["evt"]
    st.ingest([{"a": 1}], p_timestamp=datetime(2026, 8, 10, 9, 0))
    st.flush()
    api.put_retention("evt", [{"description": "d", "action": "delete", "duration": "10d"}])
    seen = set()
    for p in _artifact_jsons(root):
        with open(p) as f:
            obj = json.load(f)
        assert isinstance(obj, dict) and "version" in obj, p
        seen.add(os.path.basename(p))
    assert {"_config.json", "retention.json"} <= seen


def test_tenant_meta_versioned(spark, tmp_path):
    from parseable_spark.tenants import TenantManager

    api = ParseableAPI(spark, str(tmp_path / "mt"), auth=("a", "b"))
    mgr = TenantManager(api, multi_tenant=True)
    mgr.add_tenant("acme")
    mpath = mgr._meta_path("acme")
    with open(mpath) as f:
        obj = json.load(f)
    assert obj["version"] == f"v{CURRENT_VERSIONS['tenant']}"
    # legacy (unversioned) tenant.json upgrades on discovery
    obj.pop("version")
    obj["customerName"] = "Acme"
    with open(mpath, "w") as f:
        json.dump(obj, f)
    mgr2 = TenantManager(ParseableAPI(spark, str(tmp_path / "mt"), auth=("a", "b")),
                         multi_tenant=True)
    assert mgr2.get_meta("acme").customer_name == "Acme"
    with open(mpath) as f:
        assert json.load(f)["version"] == f"v{CURRENT_VERSIONS['tenant']}"
    for m in (mgr, mgr2):
        m.delete_tenant("acme")


def test_stats_roundtrip_versioned(tmp_path):
    from parseable_spark.storage.stats import FullStats

    s = FullStats()
    s.record_ingest(5, 100, 50)
    p = str(tmp_path / "stats.json")
    s.save(p)
    with open(p) as f:
        assert json.load(f)["version"] == f"v{CURRENT_VERSIONS['stats']}"
    s2 = FullStats.load(p)
    assert s2.lifetime.events == 5
    # legacy stats load
    with open(p) as f:
        obj = json.load(f)
    obj.pop("version")
    with open(p, "w") as f:
        json.dump(obj, f)
    s3 = FullStats.load(p)
    assert s3.lifetime.events == 5
