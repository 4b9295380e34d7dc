"""Stream statistics counters — events/bytes ingested, storage size.

Parity with the reference's per-stream stats (src/stats.rs:38-115,
persisted inside stream.json — src/storage/mod.rs:351): `Stats{events,
ingestion, storage}` tracked in three ledgers — `lifetime` (monotonic),
`current` (live data), `deleted` (removed by retention). current +
deleted = lifetime.

These are driver-side counters updated on flush/retention — metadata
writes, never a data scan — which is what makes the stats API O(1) at
any data volume.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass
class Stats:
    events: int = 0
    ingestion: int = 0  # bytes of raw JSON accepted
    storage: int = 0  # bytes of parquet on disk/object store

    def add(self, events: int, ingestion: int, storage: int) -> None:
        self.events += events
        self.ingestion += ingestion
        self.storage += storage


@dataclass
class FullStats:
    lifetime: Stats = field(default_factory=Stats)
    current: Stats = field(default_factory=Stats)
    deleted: Stats = field(default_factory=Stats)

    def record_ingest(self, events: int, ingestion: int, storage: int) -> None:
        """On flush: both ledgers grow (reference event counters,
        stats.rs:53-115)."""
        self.lifetime.add(events, ingestion, storage)
        self.current.add(events, ingestion, storage)

    def record_deletion(self, events: int, ingestion: int, storage: int) -> None:
        """On retention delete: current shrinks, deleted grows, lifetime
        unchanged (reference update_deleted_stats, stats.rs:117-184)."""
        self.current.add(-events, -ingestion, -storage)
        self.deleted.add(events, ingestion, storage)

    def to_dict(self) -> dict:
        return {k: asdict(v) for k, v in vars(self).items()}

    @classmethod
    def from_dict(cls, d: dict) -> "FullStats":
        return cls(**{k: Stats(**v) for k, v in d.items()})

    def save(self, path: str) -> None:
        from ..migration import save_versioned

        save_versioned("stats", path, self.to_dict())

    @classmethod
    def load(cls, path: str) -> "FullStats":
        from ..migration import load_versioned

        data = load_versioned("stats", path)
        if data is None:
            return cls()
        data.pop("version", None)
        return cls.from_dict(data)
