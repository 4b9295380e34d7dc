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
import shutil
from dataclasses import dataclass, field


@dataclass
class HotTier:
    cache_dir: str
    size_limit: int  # bytes
    _sizes: dict[str, int] = field(default_factory=dict)  # local -> bytes

    def __post_init__(self) -> None:
        os.makedirs(self.cache_dir, exist_ok=True)
        for root, _, names in os.walk(self.cache_dir):
            for n in names:
                p = os.path.join(root, n)
                self._sizes[p] = os.path.getsize(p)

    # --- bookkeeping ----------------------------------------------------
    def used_bytes(self) -> int:
        return sum(self._sizes.values())

    def _local_path(self, remote_path: str) -> str:
        # mirror the partition-dir layout so eviction order == time order
        return os.path.join(self.cache_dir, remote_path.lstrip("/").replace(":", "_"))

    def _evict_until(self, needed: int) -> None:
        """Oldest-first eviction (lexicographic on the mirrored
        date=/hour=/minute= layout == chronological) until `needed`
        bytes fit under the quota (hottier.rs:1287-1312)."""
        if needed > self.size_limit:
            return  # won't fit at all; caller falls back to remote
        for p in sorted(self._sizes):
            if self.used_bytes() + needed <= self.size_limit:
                break
            try:
                os.remove(p)
            except OSError:
                pass
            self._sizes.pop(p, None)

    # --- cache operations -------------------------------------------------
    def add(self, remote_path: str) -> str | None:
        """Pull one parquet file into the hot tier; returns the local
        path, or None when the file exceeds the whole quota."""
        local = self._local_path(remote_path)
        if local in self._sizes:
            return local
        size = os.path.getsize(remote_path)
        if size > self.size_limit:
            return None
        self._evict_until(size)
        os.makedirs(os.path.dirname(local), exist_ok=True)
        shutil.copyfile(remote_path, local)
        self._sizes[local] = size
        return local

    def lookup(self, remote_path: str) -> str | None:
        local = self._local_path(remote_path)
        return local if local in self._sizes else None

    def invalidate(self, remote_path: str) -> None:
        """Drop a cached copy whose remote file was deleted (retention/
        compaction); without this, dead entries occupy quota forever
        and eviction chews through live recent buckets instead
        (review finding)."""
        local = self._local_path(remote_path)
        if self._sizes.pop(local, None) is not None:
            try:
                os.remove(local)
            except OSError:
                pass

    def resolve(self, remote_paths: list[str]) -> list[str]:
        """Swap each path for its hot-tier copy when cached (the scan
        branch split of stream_schema_provider.rs:232-289; misses stay
        remote — correctness never depends on the cache)."""
        return [self.lookup(p) or p for p in remote_paths]
