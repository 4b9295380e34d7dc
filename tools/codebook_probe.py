"""Codebook persistence probe (judge r9 next-3): take the ANN codebook
across its own measured cliff.

The r8/r9 numbers located the JSON codebook's limit: 1.2 s/0.3 s
save/load at 10^4 nodes x 128 dims (26 MB), 12 s/4 s at 10^5 (261 MB),
71 s/24 s and 1.6 GB resident at 10^5 x 768 dims — whole tree rewritten
per split batch, whole tree resident AND py4j-marshalled per assign.

r10 replaced it with an append-only parquet log partitioned by tree
level (streaming/ann_index.py module docstring). This probe measures,
per (nodes, dims) point, BOTH sides:

- parquet: per-append seconds (must be O(new nodes), flat in tree
  size), topology load seconds, load rchar (the partial-load proof:
  a column-pruned read must NOT touch the vector pages — megabytes
  against a ~600 MB codebook), python-heap peak during load
  (tracemalloc — the resident-bytes bound), on-disk bytes.
- legacy JSON (reconstructed at the same size): save seconds / load
  seconds / file bytes — the A/B this probe exists to retire.

Counters are PYTHON-process /proc/self/io rchar: pyarrow reads happen
in-process, so the counter is page-cache-honest for the load path.

Usage:
    python tools/codebook_probe.py                 # default axis
    python tools/codebook_probe.py 100000 768      # one point
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rchar() -> int:
    with open("/proc/self/io") as f:
        for line in f:
            if line.startswith("rchar:"):
                return int(line.split()[1])
    return 0


def _dir_bytes(root: str) -> int:
    total = 0
    for r, _, fs in os.walk(root):
        for n in fs:
            total += os.path.getsize(os.path.join(r, n))
    return total


def build_codebook(idx, n_nodes: int, dims: int, chunks: int = 64):
    """Synthesize a 2-level tree (16 roots, the rest leaves) through
    the PRODUCTION append API in split-batch-sized chunks — the same
    write path compaction splits use."""
    import numpy as np

    rng = np.random.default_rng(42)
    roots = list(range(16))
    idx._nodes = {c: {"parent": None} for c in roots}
    idx._append_codebook_rows(
        [(c, None, rng.standard_normal(dims).tolist()) for c in roots]
    )
    remaining = n_nodes - 16
    per = -(-remaining // chunks)
    nxt = 16
    append_times = []
    while remaining > 0:
        take = min(per, remaining)
        vecs = rng.standard_normal((take, dims))
        rows = []
        for i in range(take):
            cid = nxt + i
            parent = cid % 16
            idx._nodes[cid] = {"parent": parent}
            rows.append((cid, parent, vecs[i].tolist()))
        t0 = time.time()
        idx._append_codebook_rows(rows)
        append_times.append(time.time() - t0)
        nxt += take
        remaining -= take
    return append_times


def probe_point(spark, n_nodes: int, dims: int) -> dict:
    from parseable_spark.streaming.ann_index import StreamingEmbeddingIndex

    base = tempfile.mkdtemp(prefix=f"cbprobe_{n_nodes}_{dims}_")
    idx = StreamingEmbeddingIndex(spark, base, n_cells=16)
    append_s = build_codebook(idx, n_nodes, dims)
    disk = _dir_bytes(idx._codebook_root)

    # topology load: fresh object, cold python state
    tracemalloc.start()
    r0, t0 = _rchar(), time.time()
    idx2 = StreamingEmbeddingIndex(spark, base, n_cells=16)
    load_s = time.time() - t0
    load_rchar = _rchar() - r0
    _, heap_peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert idx2._nodes is not None and len(idx2._nodes) == n_nodes

    # assignment end-to-end: the partial-load consumer (vectors read
    # by the Spark job, level-pruned; driver ships no vectors)
    from pyspark.sql import functions as F

    batch = (
        spark.range(0, 64)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(1), F.lit(dims)),
                lambda i: F.sin(
                    F.xxhash64(F.col("doc_id") * 7919 + i).cast("double")
                ),
            ),
        )
    )
    t0 = time.time()
    n_assigned = idx2._assign_cells(batch, 2).count()
    assign_s = time.time() - t0

    # legacy JSON A/B at the same size: reconstruct the pre-r10 file
    # shape and measure its save/load on this box
    import numpy as np

    rng = np.random.default_rng(7)
    nodes = [
        [c, nd["parent"], rng.standard_normal(dims).tolist()]
        for c, nd in sorted(idx2._nodes.items())
    ]
    jpath = os.path.join(base, "legacy.json")
    t0 = time.time()
    with open(jpath, "w") as f:
        json.dump({"nodes": nodes}, f)
    json_save_s = time.time() - t0
    del nodes
    t0 = time.time()
    with open(jpath) as f:
        raw = json.load(f)
    loaded = {
        int(cid): {"v": list(map(float, v)), "parent": p}
        for cid, p, v in raw["nodes"]
    }
    json_load_s = time.time() - t0
    json_bytes = os.path.getsize(jpath)
    del raw, loaded

    out = {
        "nodes": n_nodes,
        "dims": dims,
        "parquet_disk_mb": round(disk / 1e6, 1),
        "append_mean_s": round(sum(append_s) / len(append_s), 3),
        "append_max_s": round(max(append_s), 3),
        "topo_load_s": round(load_s, 3),
        "topo_load_rchar_mb": round(load_rchar / 1e6, 2),
        "topo_heap_peak_mb": round(heap_peak / 1e6, 1),
        "assign64_s": round(assign_s, 1),
        "assigned_rows": n_assigned,
        "json_save_s": round(json_save_s, 1),
        "json_load_s": round(json_load_s, 1),
        "json_mb": round(json_bytes / 1e6, 1),
    }
    shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    from parseable_spark.session import get_spark

    spark = get_spark("codebook-probe")
    spark.sparkContext.setLogLevel("ERROR")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        points = [(int(args[0]), int(args[1]) if len(args) > 1 else 768)]
    else:
        points = [(10_000, 128), (100_000, 128), (100_000, 768)]
    for n, d in points:
        print(json.dumps(probe_point(spark, n, d)), flush=True)


if __name__ == "__main__":
    main()
