"""Semantic curator stage at PRODUCTION batch sizes (judge r9 next-6).

The r9 drill measured the semantic stage at toy batches (~100 docs):
+2.8 s/batch — but that is fixed per-batch overhead (assign/probe/fold
job scheduling), so the amortization claim ("overhead % falls as the
batch grows") was an argument, not a measurement. This probe runs the
COMPOSED curator (quality gates + Bloom exact gate + cross-batch LSH
near-dup) with the semantic stage OFF vs ON at batch sizes from the
drill's toy regime up to 2^16 docs, three batches each (batch 0 also
pays codebook/index bootstrap — reported separately), and prints the
steady-state per-batch overhead in seconds and percent.

Docs are generated JVM-side (no py4j row marshalling): pseudo-word
text with periodic stopwords (so the quality gates pass), embeddings
from 96 anchors with planted near-copies across batches (the semantic
stage has real pairs to find, not just empty probes).

Usage:
    python tools/semantic_batch_probe.py            # 2^10 2^13 2^16
    python tools/semantic_batch_probe.py 10 14      # one size range
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N_BATCHES = 3


def gen(spark, start: int, n: int, batch_tag: int):
    from pyspark.sql import functions as F

    key = F.col("doc_id")
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.when(i % 4 == 0, F.lit("the")).otherwise(
            F.substring(F.md5((key * 131 + i).cast("string")), 1, 6)
        ),
    )
    # ~3% of docs reuse an earlier doc's embedding key → cross-batch
    # planted semantic near-copies (same anchor AND same secondary
    # term, tiny private noise)
    ekey = F.when(
        (key % 37 == 0) & F.lit(batch_tag > 0), key - F.lit(n)
    ).otherwise(key)
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (
            F.sin(F.xxhash64((ekey % 96) * 1000003 + i).cast("double"))
            + 0.35 * F.sin(F.xxhash64(ekey * 104729 + i).cast("double"))
            + 0.02 * F.sin(F.xxhash64(key * 7919 + i * 13).cast("double"))
        ),
    )
    return (
        spark.range(start, start + n)
        .withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat_ws(" ", words))
        .withColumn("embedding", emb)
    )


def run_mode(
    spark, n_docs: int, semantic: bool, budget: int | None = None
) -> list[float]:
    from parseable_spark.streaming.curator import StreamingCurator

    base = tempfile.mkdtemp(prefix=f"sembatch_{n_docs}_{semantic}_")
    cur = StreamingCurator(
        spark,
        base,
        min_stopword_ratio=0.05,
        near_dup_history=True,
        semantic_dup_history=semantic,
        semantic_pair_budget=budget,
    )
    walls = []
    for b in range(N_BATCHES):
        batch = gen(spark, b * n_docs, n_docs, b).localCheckpoint()
        t0 = time.time()
        cur.process_batch(batch, b)
        walls.append(round(time.time() - t0, 2))
    drops = (
        cur.decisions().filter("reason = 'near_duplicate_semantic'").count()
        if semantic
        else 0
    )
    extra = {}
    if semantic and budget:
        # the honest companions of a bounded wall: verdicts that
        # landed late (advisory) and probe rows still carried
        extra["late_semantic"] = cur.late_semantic().count()
        backlog = cur.ann._read_deferred()
        extra["deferred_backlog_rows"] = (
            backlog.count() if backlog is not None else 0
        )
    shutil.rmtree(base, ignore_errors=True)
    return walls, drops, extra


def main() -> None:
    from parseable_spark.session import get_spark

    spark = get_spark("semantic-batch-probe")
    spark.sparkContext.setLogLevel("ERROR")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sizes = (
        [1 << int(a) for a in args] if args else [1 << 10, 1 << 13, 1 << 16]
    )
    budget = None
    for a in sys.argv[1:]:
        if a.startswith("--budget="):
            budget = int(a.split("=", 1)[1])
    for n in sizes:
        base_w, _, _ = run_mode(spark, n, semantic=False)
        sem_w, drops, extra = run_mode(spark, n, semantic=True, budget=budget)
        # steady state = batches 1.. (batch 0 pays codebook bootstrap)
        b_s = sum(base_w[1:]) / len(base_w[1:])
        s_s = sum(sem_w[1:]) / len(sem_w[1:])
        print(
            json.dumps(
                {
                    "batch_docs": n,
                    "base_walls_s": base_w,
                    "semantic_walls_s": sem_w,
                    "steady_base_s": round(b_s, 2),
                    "steady_semantic_s": round(s_s, 2),
                    "steady_overhead_s": round(s_s - b_s, 2),
                    "steady_overhead_pct": round(100 * (s_s - b_s) / b_s, 1),
                    "bootstrap_overhead_s": round(sem_w[0] - base_w[0], 2),
                    "max_semantic_wall_s": max(sem_w[1:]),
                    "semantic_drops": drops,
                    "pair_budget": budget,
                    **extra,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
