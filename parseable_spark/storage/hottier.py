"""Hot tier — local-disk cache of object-store parquet with a size
quota and oldest-first eviction.

Parity with the reference hot tier (src/hottier.rs: per-stream size
quota :248, oldest-bucket eviction when over budget :1287-1312, scans
served from local disk via the hot-tier branch of the table provider —
stream_schema_provider.rs:232-289).

Spark mapping: `resolve()` swaps object-store paths for their local
copies before `spark.read.parquet(paths)`, so hot (recent) partitions
scan at local-NVMe speed while cold history stays on the object store —
on a real cluster this is per-executor disk; locally one directory
stands in. Correctness is unaffected: a miss just reads the remote
path. Eviction is oldest-time-bucket-first, matching the reference's
assumption that queries skew recent.
"""

from __future__ import annotations

import os
import re
import shutil
import threading
import time
from dataclasses import dataclass, field

# reference StreamHotTier version stamp (hottier.rs:236)
CURRENT_HOT_TIER_VERSION = "v2"

# Evicted/invalidated cache copies are deleted after this grace, not
# inline: scan() resolves hot-tier local paths under the API lock but
# Spark OPENS them after release, so an inline delete intermittently
# 500s in-flight queries — the same race compaction tombstones guard
# (storage/store.py TOMBSTONE_GRACE_SECONDS); > the 300 s query timeout.
EVICT_GRACE_SECONDS = 330.0

# reference P_MAX_DISK_USAGE_PERCENT default (cli.rs:410-421)
DEFAULT_MAX_DISK_USAGE_PERCENT = 80.0


class HotTierError(ValueError):
    """Rejected hot-tier configuration (maps to HTTP 400)."""


@dataclass
class HotTier:
    cache_dir: str
    size_limit: int  # bytes
    _sizes: dict[str, int] = field(default_factory=dict)  # local -> bytes
    # backfill may run on a background sync thread while flush-fill and
    # scan-resolve run on request threads; one lock covers the
    # size-accounting + evict decisions (a file is only registered in
    # _sizes after its copy completes, so resolve can never return a
    # half-copied file)
    _mu: threading.RLock = field(
        default_factory=threading.RLock, repr=False, compare=False
    )
    # set by close(): the tier was deleted while a background backfill
    # may still be copying — add() becomes a no-op so the sync thread
    # cannot resurrect the removed cache dir (review finding)
    _closed: bool = field(default=False, repr=False, compare=False)

    # evicted/invalidated local copies awaiting physical delete:
    # (path, monotonic deadline). Quota accounting drops them
    # immediately; disk usage can exceed the quota by at most one
    # grace window of evictions.
    _graveyard: list = field(default_factory=list, repr=False, compare=False)

    def __post_init__(self) -> None:
        os.makedirs(self.cache_dir, exist_ok=True)
        # a delete marker means this dir's contents belong to a DELETED
        # tier awaiting its grace-period sweep; attaching a new tier
        # over them must start EMPTY (and clear the marker, or the
        # sweeper would rmtree the live tier later). Cache-only data:
        # it refills from the store.
        marker = os.path.join(self.cache_dir, ".ht-deleted")
        if os.path.exists(marker):
            for n in os.listdir(self.cache_dir):
                p = os.path.join(self.cache_dir, n)
                shutil.rmtree(p, ignore_errors=True) if os.path.isdir(
                    p
                ) else os.remove(p)
        # graveyard is persisted (wall-clock deadlines): without it a
        # restart re-registered buried copies of DELETED remotes into
        # _sizes as phantom quota, and their disk bytes lived forever
        # (r7 review)
        dead: set[str] = set()
        try:
            import json as _json

            with open(os.path.join(self.cache_dir, "_graveyard.json")) as f:
                for p, deadline in _json.load(f):
                    dead.add(p)
                    self._graveyard.append((p, float(deadline)))
        except (FileNotFoundError, ValueError):
            pass
        for root, _, names in os.walk(self.cache_dir):
            for n in names:
                p = os.path.join(root, n)
                if n.endswith(".tmp-ht"):
                    # a crash mid-copy left a partial file; add() copies
                    # to tmp then os.replace's, so finals are complete
                    try:
                        os.remove(p)
                    except OSError:
                        pass
                    continue
                if n == "_graveyard.json" or p in dead:
                    continue
                self._sizes[p] = os.path.getsize(p)

    def _save_graveyard(self) -> None:
        """Caller holds _mu. Crash-safe tmp+replace; wall-clock
        deadlines so a restart resumes the same grace windows."""
        import json as _json

        path = os.path.join(self.cache_dir, "_graveyard.json")
        tmp = path + ".tmp"
        try:
            with open(tmp, "w") as f:
                _json.dump(self._graveyard, f)
            os.replace(tmp, path)
        except OSError:
            pass  # bookkeeping best-effort; reap self-heals next pass

    # --- bookkeeping ----------------------------------------------------
    def used_bytes(self) -> int:
        # under _mu: the background backfill thread inserts into _sizes
        # concurrently, and sum(dict.values()) over a mutating dict
        # raises RuntimeError (review finding — "one lock covers the
        # size-accounting" must include the readers)
        with self._mu:
            return sum(self._sizes.values())

    def _local_path(self, remote_path: str) -> str:
        # mirror the partition-dir layout so eviction order == time order
        return os.path.join(self.cache_dir, remote_path.lstrip("/").replace(":", "_"))

    def _bury(self, local: str) -> None:
        """Schedule a cache copy for deferred physical delete (see
        EVICT_GRACE_SECONDS). Wall-clock deadline (persisted — survives
        restarts). Caller holds _mu."""
        self._graveyard.append((local, time.time() + EVICT_GRACE_SECONDS))
        self._save_graveyard()

    def _reap_graveyard(self) -> None:
        """Physically delete buried copies past their grace. Entries
        whose path was re-added in the meantime are simply dropped —
        add() overwrites via os.replace, so the live copy stays.
        Caller holds _mu."""
        now = time.time()
        keep = []
        for p, deadline in self._graveyard:
            if p in self._sizes:
                continue  # re-added; cancel the pending delete
            if deadline <= now:
                try:
                    os.remove(p)
                except OSError:
                    pass
            else:
                keep.append((p, deadline))
        if len(keep) != len(self._graveyard):
            self._graveyard = keep
            self._save_graveyard()

    def _evict_until(self, needed: int) -> None:
        """Oldest-first eviction (lexicographic on the mirrored
        date=/hour=/minute= layout == chronological) until `needed`
        bytes fit under the quota (hottier.rs:1287-1312). Evicted
        copies are buried, not deleted inline — an in-flight query may
        hold the resolved local path."""
        if needed > self.size_limit:
            return  # won't fit at all; caller falls back to remote
        for p in sorted(self._sizes):
            if self.used_bytes() + needed <= self.size_limit:
                break
            self._sizes.pop(p, None)
            self._bury(p)

    # --- cache operations -------------------------------------------------
    def add(self, remote_path: str) -> str | None:
        """Pull one parquet file into the hot tier; returns the local
        path, or None when the file exceeds the whole quota.

        The bulk COPY runs OUTSIDE _mu (r7 review: holding the lock
        across a multi-second copyfile stalled every query's resolve()
        and every flush's fill behind each backfill file); only the
        bookkeeping (evict decision, atomic rename, registration)
        takes the lock. Unique tmp names keep two concurrent adds of
        the same path from interleaving writes into one tmp file."""
        import uuid as _uuid

        local = self._local_path(remote_path)
        with self._mu:
            if self._closed:
                return None
            if local in self._sizes:
                return local
        try:
            size = os.path.getsize(remote_path)
            if size > self.size_limit:
                return None
            os.makedirs(os.path.dirname(local), exist_ok=True)
            # tmp + atomic replace: a crash mid-copy must not leave
            # a truncated parquet at the final path (__post_init__
            # would register it and every scan of the bucket would
            # fail on a corrupt footer until manual cleanup)
            tmp = f"{local}.{_uuid.uuid4().hex[:8]}.tmp-ht"
            shutil.copyfile(remote_path, tmp)
        except FileNotFoundError:
            # retention/compaction deleted the source between the
            # caller's existence check and the copy — a cache fill
            # must degrade to a miss, not kill the sync thread
            # (review finding)
            return None
        with self._mu:
            if self._closed or local in self._sizes:
                try:
                    os.remove(tmp)  # lost the race / tier deleted
                except OSError:
                    pass
                return None if self._closed else local
            self._reap_graveyard()
            self._evict_until(size)
            os.replace(tmp, local)
            self._sizes[local] = size
            return local

    def lookup(self, remote_path: str) -> str | None:
        with self._mu:
            local = self._local_path(remote_path)
            return local if local in self._sizes else None

    def invalidate(self, remote_path: str) -> None:
        """Drop a cached copy whose remote file was deleted (retention/
        compaction); without this, dead entries occupy quota forever
        and eviction chews through live recent buckets instead
        (review finding)."""
        with self._mu:
            local = self._local_path(remote_path)
            if self._sizes.pop(local, None) is not None:
                # buried, not removed inline: the deleting pass (e.g.
                # retention) may race an in-flight query that already
                # resolved this local path
                self._bury(local)
            self._reap_graveyard()

    def resolve(self, remote_paths: list[str]) -> list[str]:
        """Swap each path for its hot-tier copy when cached (the scan
        branch split of stream_schema_provider.rs:232-289; misses stay
        remote — correctness never depends on the cache)."""
        with self._mu:
            # reap on the query path too: an IDLE tier (stream stopped
            # ingesting right after a retention invalidated entries)
            # otherwise kept buried copies on disk forever — the
            # add()/invalidate()-only reap never ran again (r7 review)
            self._reap_graveyard()
        return [self.lookup(p) or p for p in remote_paths]

    # --- reference StreamHotTier surface (hottier.rs:240-250, 674-717) ---
    def available_bytes(self) -> int:
        return max(self.size_limit - self.used_bytes(), 0)

    def oldest_entry(self) -> str | None:
        """Timestamp string of the oldest cached time bucket, from the
        mirrored date=/hour=/minute= layout (the reference's
        get_oldest_date_time_entry, hottier.rs:1469-1517, which walks
        its date-sorted local dirs the same way)."""
        with self._mu:
            if not self._sizes:
                return None
            p = min(self._sizes)  # lexicographic == chronological (layout)
        m = re.search(
            r"date=(\d{4}-\d{2}-\d{2})(?:/hour=(\d{2}))?(?:/minute=(\d{2}))?", p
        )
        if not m:
            return None
        return (
            f"{m.group(1)}T{m.group(2) or '00'}:{m.group(3) or '00'}:00.000Z"
        )

    def meta(self) -> dict:
        """The reference's StreamHotTier response shape — what
        GET /logstream/{stream}/hottier returns (hottier.rs:674-717
        recomputes used/available/oldest from the runtime state on
        every read, exactly as here)."""
        used = self.used_bytes()
        return {
            "version": CURRENT_HOT_TIER_VERSION,
            "size": self.size_limit,
            "used_size": used,
            "available_size": max(self.size_limit - used, 0),
            "oldest_date_time_entry": self.oldest_entry(),
        }

    def validate_resize(self, new_size: int) -> None:
        """Reject shrinking below current usage (hottier.rs:606-664
        validate_hot_tier_size: 'the existing used size is larger than
        the requested size')."""
        used = self.used_bytes()
        if new_size < used:
            raise HotTierError(
                f"hot tier size {new_size} is below the {used} bytes "
                "already in use; evict by deleting the hot tier first"
            )

    def backfill(self, manifest, time_col: str) -> int:
        """Manifest-driven sync: pull committed history into the tier
        NEWEST-first until the quota is reached (the reference's
        per-stream sync task — fetch_hot_tier_dates walks dates in
        reverse order and downloads manifest-listed files until
        available_size runs out, hottier.rs:797-1010, 1351-1418).

        Unlike ``add`` (the flush-time fill, where fresh data evicts
        the oldest buckets), backfill never evicts: candidates are
        visited newest-first, so anything already cached is at least
        as hot as the candidate — when a file no longer fits, the sync
        is done. Returns the number of files pulled."""
        files = sorted(
            manifest.files,
            key=lambda f: (f.time_bounds(time_col) or ("", ""))[1],
            reverse=True,
        )
        added = 0
        for f in files:
            if self._closed:
                break  # tier deleted mid-sync; stop copying
            if self.lookup(f.file_path) is not None:
                continue
            if not os.path.exists(f.file_path):
                continue  # remote-only file in a hybrid layout: skip
            if f.file_size > self.available_bytes():
                break
            if self.add(f.file_path) is not None:
                added += 1
        return added

    def close(self) -> None:
        """Mark the tier deleted. Taking _mu first waits out any
        in-flight add() copy; afterwards every add()/backfill() is a
        no-op, so the caller can safely rmtree the cache dir without a
        background sync thread recreating it."""
        with self._mu:
            self._closed = True
            self._sizes.clear()
            self._graveyard.clear()  # caller rmtrees the whole dir


def validate_disk_capacity(
    cache_root: str,
    additional_bytes: int,
    other_hot_tier_bytes: int = 0,
    max_disk_usage_percent: float | None = None,
) -> None:
    """The reference's disk-capacity gate (hottier.rs:606-664 +
    is_disk_available :1435-1467): the requested quota, on top of
    current disk usage and every OTHER stream's hot-tier allocation,
    must stay under P_MAX_DISK_USAGE_PERCENT of the volume (default
    80%, cli.rs:410-421)."""
    if max_disk_usage_percent is None:
        max_disk_usage_percent = float(
            os.environ.get(
                "P_MAX_DISK_USAGE_PERCENT", DEFAULT_MAX_DISK_USAGE_PERCENT
            )
        )
    os.makedirs(cache_root, exist_ok=True)
    du = shutil.disk_usage(cache_root)
    threshold = du.total * max_disk_usage_percent / 100.0
    projected = (du.total - du.free) + additional_bytes + other_hot_tier_bytes
    if projected > threshold:
        raise HotTierError(
            f"hot tier size would push disk usage to {projected} bytes, "
            f"over the {max_disk_usage_percent:.1f}% threshold "
            f"({int(threshold)} of {du.total} bytes)"
        )
