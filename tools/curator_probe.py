"""Streaming-curator cost probe: per-batch wall as history grows.

The scale question for a rolling 100 TB curation pipeline: does the
per-batch cost stay FLAT while committed history grows? Two regimes:

- default (Bloom gate + quality + in-batch near-dup): the gate probes a
  constant-size bitmap index, everything else is in-batch — flat.
- ``--near-dup-history``: adds the cross-batch LSH stage. Candidate
  probing reads the persisted banded index (grows with KEPT history,
  never re-scans text); verification reads only the candidates'
  historical text from kept/. Cost should grow with the CANDIDATE
  count, not the history size — near-flat on de-duplicated input.

Usage:
    python tools/curator_probe.py [N_BATCHES] [--near-dup-history]

Run on a QUIET box (see SCALE.md round-5 variance note).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_batches = int(args[0]) if args else 8
    near_hist = "--near-dup-history" in sys.argv

    from pyspark.sql import functions as F

    from parseable_spark.session import get_spark

    # the shared builder: driver memory, UTC, AQE confs, core-count-sized
    # shuffle partitions — probe numbers must be comparable to the other
    # tools/, which all run under this profile
    spark = get_spark("curator-probe")
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .withColumn("_b", F.pmod(F.xxhash64("doc_id"), F.lit(n_batches)))
    )

    from parseable_spark.streaming.curator import StreamingCurator

    base_dir = tempfile.mkdtemp(prefix="curator_probe_")
    cur = StreamingCurator(
        spark, base_dir, near_dup_history=near_hist
    )
    walls = []
    for b in range(n_batches):
        batch = docs.filter(F.col("_b") == b).drop("_b")
        t0 = time.time()
        cur.process_batch(batch, b)
        walls.append(round(time.time() - t0, 2))
    kept = cur.kept().count()
    dropped = cur.decisions().count()
    reasons = {
        r["reason"]: r["n"]
        for r in cur.decisions().groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    print(
        json.dumps(
            {
                "near_dup_history": near_hist,
                "batches": n_batches,
                "per_batch_wall_s": walls,
                "kept": kept,
                "dropped": dropped,
                "reasons": reasons,
            }
        )
    )


if __name__ == "__main__":
    main()
