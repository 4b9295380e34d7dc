"""Catalog: snapshot → manifests → per-file column statistics.

Faithful to the reference's metadata layer (SURVEY.md §1.6,
src/catalog/): stats-bearing manifests power planning-time file
pruning, the COUNT(*) fast path, and metadata-only histograms.
"""

from .manifest import FileStats, Manifest, Snapshot, build_file_stats

__all__ = ["FileStats", "Manifest", "Snapshot", "build_file_stats"]
