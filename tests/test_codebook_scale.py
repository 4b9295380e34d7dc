"""Codebook past the old driver-residency cliff (judge r9 next-3).

The pre-r10 JSON codebook measured 71 s save / 24 s load / 1.6 GB
resident at 10^5 nodes x 768 dims, plus a whole-tree py4j marshal per
assign. These pins hold the parquet replacement ON THE OTHER SIDE of
that cliff: a 10^5 x 768 codebook must load its topology in seconds
with a bounded python heap, the column-pruned load must not touch the
vector pages (rchar), appends must cost O(new nodes), and assignment
must still work end-to-end reading the codebook distributively.
"""

from __future__ import annotations

import os
import time
import tracemalloc

import numpy as np
import pytest

from parseable_spark.streaming import StreamingEmbeddingIndex

N_NODES = 100_000
DIMS = 768


def _rchar() -> int:
    with open("/proc/self/io") as f:
        for line in f:
            if line.startswith("rchar:"):
                return int(line.split()[1])
    return 0


@pytest.fixture(scope="module")
def big_codebook(spark, tmp_path_factory):
    """10^5-node, 768-dim codebook built through the production append
    API in split-batch-sized chunks (16 roots, the rest leaves)."""
    base = str(tmp_path_factory.mktemp("cb") / "ann")
    idx = StreamingEmbeddingIndex(spark, base, n_cells=16)
    rng = np.random.default_rng(42)
    idx._nodes = {c: {"parent": None} for c in range(16)}
    idx._append_codebook_rows(
        [(c, None, rng.standard_normal(DIMS).tolist()) for c in range(16)]
    )
    nxt, append_times = 16, []
    while nxt < N_NODES:
        take = min(2048, N_NODES - nxt)
        vecs = rng.standard_normal((take, DIMS))
        rows = []
        for i in range(take):
            cid = nxt + i
            idx._nodes[cid] = {"parent": cid % 16}
            rows.append((cid, cid % 16, vecs[i].tolist()))
        t0 = time.time()
        idx._append_codebook_rows(rows)
        append_times.append(time.time() - t0)
        nxt += take
    return base, append_times


def test_topology_load_time_and_heap_bounded(spark, big_codebook):
    base, _ = big_codebook
    tracemalloc.start()
    r0, t0 = _rchar(), time.time()
    idx = StreamingEmbeddingIndex(spark, base, n_cells=16)
    load_s = time.time() - t0
    load_rchar = _rchar() - r0
    _, heap_peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert idx._nodes is not None and len(idx._nodes) == N_NODES
    # the JSON codebook took 24 s and 1.6 GB here; topology-only load
    # must stay orders of magnitude under both
    assert load_s < 10.0, f"topology load {load_s:.1f}s"
    assert heap_peak < 200 * 1024 * 1024, f"python heap peak {heap_peak}"
    # partial-load proof: the column-pruned read must skip the ~600 MB
    # of vector pages (pyarrow reads in-process, so rchar sees them)
    assert load_rchar < 64 * 1024 * 1024, f"load read {load_rchar} bytes"
    # and no vectors are resident in the topology
    assert all("v" not in nd for nd in idx._nodes.values())


def test_append_cost_independent_of_tree_size(big_codebook, spark):
    _, append_times = big_codebook
    # each append writes one ~2048-node chunk; if appends rewrote the
    # tree (the JSON behavior) the last chunks would cost ~50x the
    # first. Allow generous jitter, forbid growth.
    head = sum(append_times[:5]) / 5
    tail = sum(append_times[-5:]) / 5
    assert tail < head * 3 + 0.5, f"append grew: head {head:.3f}s tail {tail:.3f}s"


def test_assignment_reads_codebook_distributively(spark, big_codebook):
    base, _ = big_codebook
    idx = StreamingEmbeddingIndex(spark, base, n_cells=16)
    from pyspark.sql import functions as F

    batch = (
        spark.range(0, 32)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(1), F.lit(DIMS)),
                lambda i: F.sin(
                    F.xxhash64(F.col("doc_id") * 7919 + i).cast("double")
                ),
            ),
        )
    )
    assigned = idx._assign_cells(batch, 2)
    rows = assigned.collect()
    assert len(rows) == 64  # 32 docs x nprobe 2
    kids = idx._children
    leaves = set(idx._nodes) - set(kids)
    assert {r["cell"] for r in rows} <= leaves
    # the descent plan reads the codebook level-pruned, with no
    # python-side evaluation
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_legacy_json_migrates_once(spark, tmp_path):
    """A pre-r10 centroids.json store opens, migrates to the parquet
    log, and keeps identical assignments."""
    import json as _json
    import math
    import random

    rng = random.Random(3)

    def unit():
        v = [rng.gauss(0, 1) for _ in range(8)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    base = str(tmp_path / "ann")
    os.makedirs(base, exist_ok=True)
    nodes = [[c, None, unit()] for c in range(4)]
    nodes += [[4 + i, i % 4, unit()] for i in range(8)]
    with open(os.path.join(base, "centroids.json"), "w") as f:
        _json.dump({"nodes": nodes}, f)
    idx = StreamingEmbeddingIndex(spark, base, n_cells=4)
    assert len(idx._nodes) == 12
    assert os.path.isdir(os.path.join(base, "codebook"))
    assert not os.path.exists(os.path.join(base, "centroids.json"))
    # reopen reads the parquet log; same topology, same centroids
    idx2 = StreamingEmbeddingIndex(spark, base, n_cells=4)
    assert idx2._nodes == idx._nodes
    assert idx2._centroids == idx._centroids
    got = {c for c, _ in idx2._centroids}
    assert got == set(range(4, 12))
