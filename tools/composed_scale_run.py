"""One composed 100×-shaped run (VERDICT r10 next-8, stretch): the
full streaming curator — quality gates + Bloom exact gate + cross-batch
LSH + semantic ANN stage — at 65,536-doc batches until accumulated
history crosses 2^17 docs, through codebook splits and at least one
tiered cascade on BOTH streaming indexes, with per-batch wall and
JVM-process rchar/wchar deltas. Ties the r8-r10 subsystem measurements
(probe read pruning, tiered compaction writes, codebook parquet log)
together in one artifact: the per-batch cost curve is the thing a
100 TB deployment actually experiences.

Usage:
    python tools/composed_scale_run.py              # 6 batches of 2^16
    python tools/composed_scale_run.py --batches=8
    python tools/composed_scale_run.py --budget=200000   # pair budget on

Run on a QUIET box; wall numbers are meaningless under contention
(rchar/wchar are contention-safe).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semantic_batch_probe import gen  # noqa: E402  (same corpus generator)

BATCH_DOCS = 1 << 16


def _counters(jvm_pid: int) -> tuple[int, int]:
    rchar = wchar = 0
    with open(f"/proc/{jvm_pid}/io") as f:
        for line in f:
            if line.startswith("rchar:"):
                rchar = int(line.split()[1])
            elif line.startswith("wchar:"):
                wchar = int(line.split()[1])
    return rchar, wchar


def main() -> None:
    from parseable_spark.session import get_spark
    from parseable_spark.streaming.curator import StreamingCurator

    global BATCH_DOCS
    n_batches = 6
    budget = None
    for a in sys.argv[1:]:
        if a.startswith("--batches="):
            n_batches = int(a.split("=", 1)[1])
        if a.startswith("--budget="):
            budget = int(a.split("=", 1)[1])
        if a.startswith("--docs="):  # smoke only; the real run is 2^16
            BATCH_DOCS = int(a.split("=", 1)[1])
    spark = get_spark("composed-scale-run")
    spark.sparkContext.setLogLevel("ERROR")
    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
    base = tempfile.mkdtemp(prefix="composed_scale_")
    cur = StreamingCurator(
        spark,
        base,
        min_stopword_ratio=0.05,
        near_dup_history=True,
        semantic_dup_history=True,
        # split_target well below the per-batch survivor count so the
        # codebook grows during the run; compaction cadences tightened
        # so a tiered cascade happens INSIDE the measured window
        ann_split_target=2048,
        semantic_pair_budget=budget,
    )
    # compaction driven EXPLICITLY below (keep_recent=1) so the run
    # reaches tiered cascades within the window; auto-cadence off
    cur.ann.compact_every = 0
    cur.ann.max_generations = 3
    cur.ann.merge_fanout = 2
    cur.lsh.compact_every = 0
    cur.lsh.max_generations = 3
    cur.lsh.merge_fanout = 2
    header = {
        "batch_docs": BATCH_DOCS,
        "batches": n_batches,
        "pair_budget": budget,
        "history_target": 1 << 17,
        "ann": {"split_target": 2048, "explicit_compact_every": 2,
                "keep_recent": 1, "max_generations": 3,
                "merge_fanout": 2},
    }
    print(json.dumps({"header": header}), flush=True)
    total_in = 0
    for b in range(n_batches):
        batch = gen(spark, b * BATCH_DOCS, BATCH_DOCS, b).localCheckpoint()
        total_in += BATCH_DOCS
        r0, w0 = _counters(jvm_pid)
        t0 = time.time()
        cur.process_batch(batch, b)
        wall = time.time() - t0
        r1, w1 = _counters(jvm_pid)
        compact_wall = compact_w = 0.0
        if (b + 1) % 2 == 0:
            c0 = time.time()
            _, cw0 = _counters(jvm_pid)
            cur.ann.compact_index(keep_recent=1)
            cur.lsh.compact_index(keep_recent=1)
            cur.lsh.compact_texts(keep_recent=1)
            compact_wall = time.time() - c0
            _, cw1 = _counters(jvm_pid)
            compact_w = cw1 - cw0
        ann_gens = [p for p in cur.ann._index_parts() if p < 0]
        lex_gens = [p for p in cur.lsh._index_parts() if p < 0]
        backlog = cur.ann._read_deferred() if budget else None
        row = {
            "b": b,
            "history_in": total_in - BATCH_DOCS,
            "wall_s": round(wall, 1),
            "rchar_mb": round((r1 - r0) / 1e6, 1),
            "wchar_mb": round((w1 - w0) / 1e6, 1),
            "compact_wall_s": round(compact_wall, 1),
            "compact_wchar_mb": round(compact_w / 1e6, 1),
            "ann_generations": len(ann_gens),
            "ann_nodes": len(cur.ann._nodes or {}),
            "ann_split_parents": len(cur.ann._children),
            "lexical_generations": len(lex_gens),
        }
        if budget:
            row["deferred_backlog_rows"] = (
                backlog.count() if backlog is not None else 0
            )
        print(json.dumps(row), flush=True)
    summary = {
        "kept": cur.kept().count(),
        "dropped": cur.decisions().count(),
        "semantic_drops": cur.decisions()
        .filter("reason = 'near_duplicate_semantic'")
        .count(),
        "late_semantic": cur.late_semantic().count() if budget else 0,
        "total_in": total_in,
    }
    # exactness even at this size: kept ⊎ decisions == inputs
    summary["exact"] = summary["kept"] + summary["dropped"] == total_in
    print(json.dumps({"summary": summary}), flush=True)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
