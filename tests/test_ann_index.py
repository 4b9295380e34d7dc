"""StreamingEmbeddingIndex (streaming/ann_index.py) — the IVF twin of
the streaming LSH index: cross-batch SEMANTIC near-dups detected at
ingest against a partition-pruned vector index, frozen codebook,
replay-idempotent folds, flood-guarded giant cells."""

from __future__ import annotations

import math
import random

import pytest

from parseable_spark.streaming import StreamingEmbeddingIndex

DIM = 16


def _unit(rng, anchor=None, noise=0.0):
    if anchor is None:
        v = [rng.gauss(0, 1) for _ in range(DIM)]
    else:
        v = [a + rng.gauss(0, noise) for a in anchor]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


@pytest.fixture()
def corpus():
    rng = random.Random(11)
    anchors = [_unit(rng) for _ in range(4)]
    rows = []
    for i in range(40):
        rows.append((i, _unit(rng, anchors[i % 4], noise=0.45)))
    return rng, anchors, rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, embedding array<double>")


def test_cross_batch_semantic_pairs(spark, tmp_path, corpus):
    rng, anchors, rows = corpus
    idx = StreamingEmbeddingIndex(
        spark, str(tmp_path / "ann"), n_cells=4, nprobe=2, threshold=0.95
    )
    idx.process_batch(_df(spark, rows[:20]), 0)
    assert idx.pairs().count() == 0  # first batch: no history
    # batch 1: two planted near-copies of batch-0 docs + fresh docs
    b1 = rows[20:30] + [
        (100, _unit(rng, rows[3][1], noise=0.01)),
        (101, _unit(rng, rows[7][1], noise=0.01)),
    ]
    idx.process_batch(_df(spark, b1), 1)
    got = {(r["id_new"], r["id_hist"]) for r in idx.pairs().collect()}
    assert (100, 3) in got and (101, 7) in got
    # random same-cluster docs (noise 0.45) sit well under 0.95 cosine
    assert all(n in (100, 101) for n, _ in got)
    # sims are real cosines above the threshold
    sims = {r["id_new"]: r["sim"] for r in idx.pairs().collect()}
    assert sims[100] > 0.99 and sims[101] > 0.99


def test_replay_is_idempotent_and_codebook_frozen(spark, tmp_path, corpus):
    rng, anchors, rows = corpus
    d = tmp_path / "ann"
    idx = StreamingEmbeddingIndex(spark, str(d), n_cells=4, threshold=0.95)
    idx.process_batch(_df(spark, rows[:15]), 0)
    b1 = rows[15:25] + [(200, _unit(rng, rows[1][1], noise=0.01))]
    idx.process_batch(_df(spark, b1), 1)
    pairs_once = sorted(map(tuple, idx.pairs().collect()))
    index_once = sorted(
        map(tuple, idx.index_df().select("doc_id", "cell").collect())
    )
    assert any(p[0] == 200 and p[1] == 1 for p in pairs_once)
    # replay batch 1 (foreachBatch redelivery)
    idx.process_batch(_df(spark, b1), 1)
    assert sorted(map(tuple, idx.pairs().collect())) == pairs_once
    assert (
        sorted(map(tuple, idx.index_df().select("doc_id", "cell").collect()))
        == index_once
    )
    # a RESTART loads the persisted codebook: same assignments
    idx2 = StreamingEmbeddingIndex(spark, str(d), n_cells=4, threshold=0.95)
    assert idx2._centroids == idx._centroids
    assert idx2.latest_version() == 2
    idx2.process_batch(
        _df(spark, [(300, _unit(rng, rows[2][1], noise=0.01))]), 2
    )
    got = {(r["id_new"], r["id_hist"]) for r in idx2.pairs().collect()}
    assert (300, 2) in got


def test_partition_pruning_and_flood_guard(spark, tmp_path, corpus):
    rng, anchors, rows = corpus
    idx = StreamingEmbeddingIndex(
        spark, str(tmp_path / "ann"), n_cells=4, nprobe=1,
        threshold=0.9, cell_cap=5,
    )
    idx.process_batch(_df(spark, rows[:24]), 0)
    # the probe plan carries the cell partition filter
    assigned = idx._assign_cells(_df(spark, rows[24:26]), 1)
    from pyspark.sql import functions as F

    cells = [r["cell"] for r in assigned.select("cell").distinct().collect()]
    plan = (
        spark.read.parquet(idx._index_root)
        .filter(F.col("batch_id").isin(idx._visible_parts(1)))
        .filter(F.col("cell").isin(cells))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "cell" in plan.split("PartitionFilters:")[1][:300]
    # flood guard: a giant cell (cap 5, ~6 members per cell here after
    # compaction) pairs only through its representative
    idx.compact_index(keep_recent=0)  # globalize csz
    gen = spark.read.parquet(idx._index_root).filter("batch_id < 0")
    giant_cells = [
        r["cell"]
        for r in gen.groupBy("cell").count().filter(f"count > 5").collect()
    ]
    if giant_cells:  # distribution-dependent; assert when present
        flood = [
            (1000 + i, _unit(rng, anchors[giant_cells[0] % 4], noise=0.01))
            for i in range(3)
        ]
        idx.process_batch(_df(spark, flood), 1)
        batch1 = idx.pairs().filter("batch_id = 1")
        # every hist endpoint in a giant cell is that cell's rep
        reps = {
            r["crep"]
            for r in gen.filter(F.col("cell").isin(giant_cells)).collect()
        }
        hist_in_giant = {
            r["id_hist"]
            for r in batch1.collect()
            if r["id_hist"] in {
                x["doc_id"]
                for x in gen.filter(F.col("cell").isin(giant_cells)).collect()
            }
        }
        assert hist_in_giant <= reps


def test_empty_and_first_batch_shapes(spark, tmp_path):
    idx = StreamingEmbeddingIndex(spark, str(tmp_path / "ann"), n_cells=2)
    empty = spark.createDataFrame([], "doc_id bigint, embedding array<double>")
    idx.process_batch(empty, 0)  # no-op, no crash
    assert idx.latest_version() is None
    assert idx.pairs().count() == 0
    assert idx.index_df() is None
