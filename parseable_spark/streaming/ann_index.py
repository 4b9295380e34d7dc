"""Streaming EMBEDDING near-dup detection against a rolling IVF index —
the semantic twin of `StreamingDedupIndex` (lexical MinHash/LSH).

A 100 TB training-data pipeline embeds documents as it ingests them;
semantic duplicates (paraphrases, re-crawls with boilerplate changes)
share high cosine similarity but not shingles, so the lexical index
misses them. This index detects them AT INGEST, against everything
streamed before, without re-scanning historical vectors:

- a small FROZEN IVF codebook (k-means on the first batch, persisted —
  the standard IVF posture: assignments must be stable or history
  lands in cells probes don't visit) partitions vector space;
- ``index/`` holds one append-only ``(batch_id, cell)`` partition per
  micro-batch (id, v, csz, crep — batch-local cell size + min-id
  representative, made global at compaction), so a probe
  PARTITION-PRUNES to the batch's `nprobe` nearest cells and reads
  O(touched cells), not O(history);
- ``pairs/`` logs verified cross-batch pairs (id_new, id_hist, sim ≥
  ``threshold``) per batch (dynamic partition overwrite — replays are
  idempotent);
- giant cells are flood-guarded exactly like LSH buckets: past
  ``cell_cap`` members, new docs compare only against the cell's
  stored representative (bounded output, connectivity preserved).

Replay/visibility discipline is inherited from
`BatchPartitionedIndex` (LATEST flips after the partition write;
`compact_index` merges out-of-grace batches into negative generations
with globally-recomputed cell stats).

Recall knobs (documented IVF trades): ``n_cells`` sizes the partitions
(≈ sqrt(corpus) at scale), ``nprobe`` nearest cells are probed per new
doc — near-boundary pairs in unprobed cells are missed, the same trade
every IVF ANN makes; raise nprobe for recall at linear probe cost.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..llm.semantic import _centroid_df, kmeans_fit
from ..functions import as_double_array, cosine
from .dedup_index import BatchPartitionedIndex, read_log, save_log_schema


class StreamingEmbeddingIndex(BatchPartitionedIndex):
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        id_col: str = "doc_id",
        vec_col: str = "embedding",
        n_cells: int = 16,
        nprobe: int = 2,
        threshold: float = 0.92,
        cell_cap: int = 1024,
        max_pairs_per_doc: int = 16,
        compact_every: int = 16,
    ) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_cells = int(n_cells)
        self.nprobe = max(1, int(nprobe))
        self.threshold = float(threshold)
        self.cell_cap = int(cell_cap)
        self.max_pairs_per_doc = int(max_pairs_per_doc)
        self.compact_every = int(compact_every)
        os.makedirs(self._index_root, exist_ok=True)
        os.makedirs(os.path.join(base_dir, "pairs"), exist_ok=True)
        # the codebook is part of the persisted layout: re-training on
        # restart would re-assign cells and break partition pruning
        # against history — first fold pins it on disk, later
        # constructions load it (same discipline as the LSH meta.json)
        self._centroids: list[tuple[int, list[float]]] | None = None
        try:
            with open(os.path.join(base_dir, "centroids.json")) as f:
                self._centroids = [
                    (int(c), list(map(float, v))) for c, v in json.load(f)
                ]
        except (FileNotFoundError, ValueError):
            pass

    # -- codebook ---------------------------------------------------------
    def _ensure_centroids(self, docs: DataFrame) -> None:
        if self._centroids is not None:
            return
        k = min(self.n_cells, docs.count())
        self._centroids = kmeans_fit(
            docs, k=max(1, k), id_col=self.id_col, vec_col=self.vec_col
        )
        path = os.path.join(self.base_dir, "centroids.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._centroids, f)
        os.replace(tmp, path)

    def _assign_cells(self, docs: DataFrame, n: int) -> DataFrame:
        """(id, v, cell, rank): each doc's ``n`` nearest cells by
        cosine against the broadcast codebook — rank 1 is the HOME cell
        (where the doc folds); ranks 2..nprobe are probe-only."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        cents = _centroid_df(self.spark, self._centroids)
        vecs = docs.select(
            F.col(self.id_col), as_double_array(self.vec_col).alias("v")
        )
        w = Window.partitionBy(self.id_col).orderBy(
            F.desc("csim"), F.asc("cid")
        )
        return (
            vecs.join(F.broadcast(cents))
            .withColumn("csim", cosine(F.col("v"), F.col("cv")))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(n))
            .select(self.id_col, "v", F.col("cid").alias("cell"), "rank")
        )

    # -- per-batch --------------------------------------------------------
    def probe_batch(
        self, batch_df: DataFrame, batch_id: int, assigned: DataFrame | None = None
    ) -> None:
        """Emit verified cross-batch near-dup pairs (id_new, id_hist,
        sim ≥ threshold) for the batch into the pairs log. The index is
        read partition-pruned to the batch's nprobe cells; giant cells
        contribute only their stored representative."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        docs = batch_df.select(self.id_col, self.vec_col)
        if not docs.head(1):
            return
        self._ensure_centroids(docs)
        if assigned is None:
            assigned = self._assign_cells(docs, self.nprobe).localCheckpoint()
        parts = self._visible_parts(self._prior_cutoff(batch_id))
        pairs = None
        if parts:
            cells = sorted(
                {r["cell"] for r in assigned.select("cell").distinct().collect()}
            )
            idx = (
                self.spark.read.parquet(self._index_root)
                .filter(F.col("batch_id").isin(parts))
                .filter(F.col("cell").isin(cells))  # partition pruning
            )
            probe = F.broadcast(
                assigned.select(
                    F.col(self.id_col).alias("_nid"),
                    F.col("v").alias("_nv"),
                    "cell",
                )
            )
            # flood guard: members of over-cap cells participate only
            # via their representative row (crep == id, batch-local in
            # fresh partitions, global in generations) — same bounded
            # trade as the LSH bucket_cap
            candidates = idx.filter(
                (F.col("csz") <= self.cell_cap)
                | (F.col(self.id_col) == F.col("crep"))
            )
            scored = (
                candidates.join(probe, "cell")
                .filter(F.col(self.id_col) != F.col("_nid"))
                .withColumn("sim", cosine(F.col("v"), F.col("_nv")))
                .filter(F.col("sim") >= self.threshold)
                .select(
                    F.col("_nid").alias("id_new"),
                    F.col(self.id_col).alias("id_hist"),
                    "sim",
                )
                .dropDuplicates(["id_new", "id_hist"])
            )
            # bound output per new doc (adversarial duplicate floods)
            wtop = Window.partitionBy("id_new").orderBy(
                F.desc("sim"), F.asc("id_hist")
            )
            pairs = (
                scored.withColumn("_rn", F.row_number().over(wtop))
                .filter(F.col("_rn") <= self.max_pairs_per_doc)
                .drop("_rn")
            )
        if pairs is None:
            pairs = self.spark.createDataFrame(
                [], assigned.select(self.id_col).schema
            ).select(
                F.col(self.id_col).alias("id_new"),
                F.col(self.id_col).alias("id_hist"),
                F.lit(0.0).alias("sim"),
            )
        stamped = pairs.withColumn("batch_id", F.lit(int(batch_id)))
        (
            stamped.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(self.base_dir, "pairs"))
        )
        save_log_schema(self.base_dir, "pairs", stamped)

    def _write_index_rows(self, rows: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        (
            rows.withColumn("batch_id", F.lit(int(batch_id)))
            .repartition(F.col("cell"))
            .sortWithinPartitions("cell", self.id_col)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "cell")
            .parquet(self._index_root)
        )

    def fold_batch(
        self, batch_df: DataFrame, batch_id: int, assigned: DataFrame | None = None
    ) -> None:
        """Append the batch's vectors to their HOME cells — O(batch),
        idempotent (dynamic partition overwrite; committed batches are
        never rewritten, exactly the LSH fold discipline)."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        docs = batch_df.select(self.id_col, self.vec_col)
        if not docs.head(1):
            return
        self._ensure_centroids(docs)
        version = int(batch_id) + 1
        if version > (self.latest_version() or 0):
            if assigned is None:
                assigned = self._assign_cells(docs, self.nprobe)
            home = assigned.filter(F.col("rank") == 1).drop("rank")
            w = Window.partitionBy("cell")
            rows = home.withColumn(
                "csz", F.count(F.lit(1)).over(w)
            ).withColumn("crep", F.min(self.id_col).over(w))
            self._write_index_rows(rows, int(batch_id))
            self._commit_version(version)
            if self.compact_every and version % self.compact_every == 0:
                self.compact_index()

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: probe history, then fold. Cells are
        assigned ONCE for both halves."""
        docs = batch_df.select(self.id_col, self.vec_col)
        if not docs.head(1):
            return
        self._ensure_centroids(docs)
        assigned = self._assign_cells(docs, self.nprobe).localCheckpoint()
        self.probe_batch(docs, batch_id, assigned=assigned)
        self.fold_batch(docs, batch_id, assigned=assigned)

    def batch_writer(self) -> Callable[[DataFrame, int], None]:
        return self.process_batch

    # -- maintenance --------------------------------------------------------
    def compact_index(self, keep_recent: int = 4) -> None:
        """Merge out-of-grace batches + ALL generations into one
        generation with GLOBAL cell stats (csz/crep) — bounds file
        count and restores the exact flood-guard view, same crash
        discipline as the LSH compactor (write-then-delete; duplicate
        rows from a crash are deduped on id)."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        parts = self._index_parts()
        lv = self.latest_version() or 0
        gens = [p for p in parts if p < 0]
        committed = [p for p in parts if 0 <= p < lv]
        if not committed:
            return
        old = [p for p in committed if p <= max(committed) - int(keep_recent)]
        if not old:
            return
        new_gen = min(gens, default=0) - 1
        sources = old + gens
        rows = (
            self.spark.read.parquet(self._index_root)
            .filter(F.col("batch_id").isin(sources))
            .select(self.id_col, "v", "cell")
            .dropDuplicates([self.id_col])
        )
        w = Window.partitionBy("cell")
        rows = rows.withColumn("csz", F.count(F.lit(1)).over(w)).withColumn(
            "crep", F.min(self.id_col).over(w)
        )
        self._write_index_rows(rows, new_gen)
        for p in sources:
            shutil.rmtree(
                os.path.join(self._index_root, f"batch_id={p}"),
                ignore_errors=True,
            )

    # -- reads ---------------------------------------------------------------
    def index_df(self) -> DataFrame | None:
        v = self.latest_version()
        if v is None:
            return None
        parts = self._visible_parts(v)
        if not parts:
            return None
        from pyspark.sql import functions as F

        return (
            self.spark.read.parquet(self._index_root)
            .filter(F.col("batch_id").isin(parts))
            .select(self.id_col, "v", "cell", "csz", "crep")
        )

    def pairs(self) -> DataFrame:
        """All verified cross-batch near-dup pairs so far
        (id_new, id_hist, sim, batch_id)."""
        return read_log(
            self.spark,
            self.base_dir,
            "pairs",
            "id_new bigint, id_hist bigint, sim double, batch_id int",
        )
