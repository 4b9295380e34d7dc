"""Streaming-index compaction WRITE amplification: amortized bytes
written by compaction per ingested batch, as history grows ×16 at
fixed compact_every — the r8 judge's #1 done bar ("a probe showing
amortized per-batch compaction WRITE bytes sublinear in history across
≥16× growth at fixed compact_every").

Two modes per index, same fold stream, same compaction cadence:

- legacy (max_generations=1): every compaction merges out-of-grace
  batches + ALL generations into one — Θ(index) bytes per compaction,
  so the per-batch amortized write cost grows LINEARLY with history.
- tiered (max_generations=8, merge_fanout=4): entry merges fold only
  the out-of-grace batches; size-tiered cascades merge the smallest
  generations when more than max_generations live — each row is
  rewritten O(log history) times over its lifetime, so the amortized
  per-batch cost stays near-flat (a log factor).

Bytes are JVM-process **wchar** deltas measured around the compaction
calls only (folds excluded) — the honest write counter, catching
parquet writes AND shuffle/checkpoint spill that are part of the
compaction's real cost. The lexical run compacts BOTH stores
(signature index + texts payload — at 100 TB the texts store is the
corpus itself). Run on a QUIET box.

Usage:
    python tools/compact_probe.py           # lexical (LSH + texts)
    python tools/compact_probe.py --ann     # embedding index (splits,
        # cross-generation pulls) + the metadata-only-count evidence
    python tools/compact_probe.py 11 15     # log2 history lo..hi
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 512
COMPACT_EVERY = 4  # fixed cadence (in batches) across all history sizes
KEEP_RECENT = 4


def _counters(jvm_pid: int) -> tuple[int, int]:
    rchar = wchar = 0
    with open(f"/proc/{jvm_pid}/io") as f:
        for line in f:
            if line.startswith("rchar:"):
                rchar = int(line.split()[1])
            elif line.startswith("wchar:"):
                wchar = int(line.split()[1])
    return rchar, wchar


def _tree_bytes(root: str) -> int:
    total = 0
    for r, _, fs in os.walk(root):
        for f in fs:
            try:
                total += os.path.getsize(os.path.join(r, f))
            except OSError:
                pass
    return total


def _run(spark, jvm_pid, make_index, fold, checkpoints, compact) -> list[dict]:
    series = []
    idx = make_index()
    folded = 0
    cum_w = 0
    window_w = 0
    window_batches = 0
    for target in checkpoints:
        t0 = time.time()
        while folded < target:
            b = folded // BATCH
            fold(idx, b, folded)
            folded += BATCH
            window_batches += 1
            if (b + 1) % COMPACT_EVERY == 0:
                _, w0 = _counters(jvm_pid)
                compact(idx)
                _, w1 = _counters(jvm_pid)
                cum_w += w1 - w0
                window_w += w1 - w0
        gens = [p for p in idx._index_parts() if p < 0]
        series.append({
            "history": folded,
            "compact_write_mb_window": round(window_w / 1e6, 1),
            "amortized_mb_per_batch": round(
                window_w / 1e6 / max(window_batches, 1), 3
            ),
            "compact_write_mb_cum": round(cum_w / 1e6, 1),
            "index_mb": round(_tree_bytes(idx.base_dir) / 1e6, 1),
            "generations": len(gens),
            "window_s": round(time.time() - t0, 1),
        })
        window_w = 0
        window_batches = 0
    return series


def lexical(lo: int, hi: int) -> None:
    from parseable_spark.session import get_spark
    from parseable_spark.streaming.dedup_index import StreamingDedupIndex

    spark = get_spark("compact-probe")
    spark.sparkContext.setLogLevel("ERROR")
    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
    rng = random.Random(23)
    words = [f"w{j}" for j in range(4096)]

    def doc(i: int) -> str:
        r = random.Random(i * 2654435761 % (1 << 31))
        return " ".join(r.choice(words) for _ in range(24))

    def fold(idx, b, start):
        docs = spark.createDataFrame(
            [(start + i, doc(start + i)) for i in range(BATCH)],
            "doc_id bigint, text string",
        )
        idx.fold_batch(docs, b)

    def compact(idx):
        idx.compact_index(keep_recent=KEEP_RECENT)
        idx.compact_texts(keep_recent=KEEP_RECENT)

    checkpoints = [1 << k for k in range(lo, hi + 1, 2)]
    out = {
        "index": "lexical (signatures + texts)",
        "batch": BATCH, "compact_every": COMPACT_EVERY, "modes": {},
    }
    for mode, kwargs in (
        ("legacy", dict(max_generations=1)),
        ("tiered", dict(max_generations=8, merge_fanout=4)),
    ):
        base = tempfile.mkdtemp(prefix=f"compact_probe_{mode}_")
        series = _run(
            spark, jvm_pid,
            lambda: StreamingDedupIndex(
                spark, base, compact_every=0, **kwargs
            ),
            fold, checkpoints, compact,
        )
        for row in series:
            print(json.dumps({"mode": mode, **row}), flush=True)
        out["modes"][mode] = series
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


def ann(lo: int, hi: int) -> None:
    from pyspark.sql import functions as F

    from parseable_spark.session import get_spark
    from parseable_spark.streaming.ann_index import StreamingEmbeddingIndex

    DIM = 64
    spark = get_spark("compact-probe-ann")
    spark.sparkContext.setLogLevel("ERROR")
    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())

    def gen_batch(start: int):
        key = F.col("doc_id")
        return (
            spark.range(start, start + BATCH)
            .withColumnRenamed("id", "doc_id")
            .withColumn(
                "embedding",
                F.transform(
                    F.sequence(F.lit(1), F.lit(DIM)),
                    lambda i: (
                        F.sin(F.xxhash64(
                            (key % 96) * 1000003 + i).cast("double"))
                        + 0.35 * F.sin(F.xxhash64(
                            key * 104729 + i).cast("double"))
                    ),
                ),
            )
        )

    def fold(idx, b, start):
        idx.fold_batch(gen_batch(start), b)

    def compact(idx):
        idx.compact_index(keep_recent=KEEP_RECENT)

    checkpoints = [1 << k for k in range(lo, hi + 1, 2)]
    out = {
        "index": "embedding (IVF, split_target=512)",
        "batch": BATCH, "compact_every": COMPACT_EVERY, "dim": DIM,
        "modes": {},
    }
    last_base = None
    mode_list = [
        ("legacy", dict(max_generations=1)),
        ("tiered", dict(max_generations=8, merge_fanout=4)),
    ]
    if "--tiered-only" in sys.argv:  # extend one axis without re-paying
        mode_list = mode_list[1:]  # the (already-established) legacy run
    for mode, kwargs in mode_list:
        base = tempfile.mkdtemp(prefix=f"compact_probe_ann_{mode}_")
        series = _run(
            spark, jvm_pid,
            lambda: StreamingEmbeddingIndex(
                spark, base, n_cells=16, nprobe=2, threshold=0.9,
                cell_cap=1 << 40, split_target=512, compact_every=0,
                max_splits_per_compaction=64, **kwargs,
            ),
            fold, checkpoints, compact,
        )
        for row in series:
            print(json.dumps({"mode": mode, **row}), flush=True)
        out["modes"][mode] = series
        if mode == "tiered":
            last_base = base
        else:
            shutil.rmtree(base, ignore_errors=True)
    # evidence for the metadata-only global cell counts the tiered
    # split path relies on: grouping by PARTITION columns only reads
    # footers, not data pages — rchar per row must be orders of
    # magnitude below the full-scan cost
    root = os.path.join(last_base, "index")
    df = spark.read.parquet(root)
    df.groupBy("cell").count().collect()  # warm listing/footers
    r0, _ = _counters(jvm_pid)
    n = df.groupBy("cell").count().count()
    r1, _ = _counters(jvm_pid)
    r2, _ = _counters(jvm_pid)
    full = df.select("v").filter(F.size("v") > 0).count()
    r3, _ = _counters(jvm_pid)
    out["metadata_count"] = {
        "cells": n,
        "count_mb": round((r1 - r0) / 1e6, 2),
        "full_scan_mb": round((r3 - r2) / 1e6, 2),
        "rows": full,
    }
    print(json.dumps(out))
    shutil.rmtree(last_base, ignore_errors=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lo = int(args[0]) if args else 11
    hi = int(args[1]) if len(args) > 1 else 15
    if "--ann" in sys.argv:
        ann(lo, hi)
    else:
        lexical(lo, hi)
