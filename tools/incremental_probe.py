"""Incremental-dedup scale probe: rolling index vs full recompute.

The claim to verify: with `build_lsh_index` / `incremental_lsh_candidates`
(llm/dedup.py), deduplicating a fixed-size daily increment against a
growing corpus costs ~O(increment) per day, while the naive approach —
re-running the full LSH pipeline over the cumulative corpus — costs
O(corpus) per day and grows without bound. At 100 TB the naive plan
re-shingles and re-hashes the entire history every day; the
incremental plan reads only the (narrow) signature index and never
touches historical text.

Method: a FIXED 500-doc increment (tail-perturbed near-dups of the
first 500 history docs, so real cross pairs exist at every size) is
deduped against histories of growing size (sf0.1 documents replicated
xN, per-replica consonant-rotated text — the scale_probe recipe, so
replicas are NOT near-dups of each other). For each history size N we
time:
  A) incremental: incremental_lsh_candidates(increment, index_N)
     reading the prebuilt parquet index (history text never touched);
  B) full recompute: minhash_lsh_candidates(history_N + increment)
     from raw text — what a pipeline without a signature index must
     run every day.
The claim holds if A stays ~flat as N grows while B grows ~linearly.
Output check at every N: A's pairs == B's pairs restricted to pairs
touching the increment.

Usage: python tools/incremental_probe.py [max_replication]
Prints one JSON line per history size + a summary.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from parseable_spark.llm.dedup import (  # noqa: E402
    build_lsh_index,
    incremental_lsh_candidates,
    merge_lsh_index,
    minhash_lsh_candidates,
)
from parseable_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
CONS = "bcdfghjklmnpqrstvwz"
ROT = {c: CONS[(i + 1) % len(CONS)] for i, c in enumerate(CONS)}


def replicate(docs, n):
    """xN with shifted ids and consonant-rotated text per replica (the
    scale_probe perturbation: changes ~every shingle)."""
    out = docs
    base = docs.agg(F.max("doc_id")).first()[0] + 1
    rot = docs
    for i in range(1, n):
        rot = rot.withColumn("text", F.translate("text", CONS, "".join(ROT[c] for c in CONS)))
        out = out.unionByName(
            rot.withColumn("doc_id", F.col("doc_id") + F.lit(i * base))
        )
    return out


def main() -> None:
    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("incremental-probe")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    base = docs.agg(F.max("doc_id")).first()[0] + 1
    # fixed 500-doc increment: tail-perturbed near-dups of the first
    # 500 docs (so ~500 genuine increment↔history pairs exist at every
    # history size), ids far above any history replica. Built
    # explicitly — an earlier version derived it through replicate()'s
    # internal (subset-relative) id base and produced an EMPTY frame,
    # making the probe vacuous; the asserts below pin non-emptiness of
    # both the increment and its pair output.
    increment = (
        docs.limit(500)
        .withColumn("text", F.concat(F.col("text"), F.lit(" incremental refresh tail")))
        .withColumn("doc_id", F.col("doc_id") + F.lit(100 * base))
        .localCheckpoint()
    )
    n_inc = increment.count()
    assert n_inc == 500, n_inc

    sizes = [n for n in (1, 2, 4, 8) if n <= max_n]
    tmp = Path(tempfile.mkdtemp(prefix="incprobe-"))
    results = []
    try:
        for n in sizes:
            history = replicate(docs, n).localCheckpoint()
            index_path = str(tmp / f"idx{n}")
            build_lsh_index(history).write.mode("overwrite").parquet(index_path)

            def run_inc():
                idx = spark.read.parquet(index_path)
                incremental_lsh_candidates(increment, idx, bucket_cap=64).write.format(
                    "noop"
                ).mode("overwrite").save()

            def run_full():
                minhash_lsh_candidates(
                    history.unionByName(increment), bucket_cap=64
                ).write.format("noop").mode("overwrite").save()

            for fn in (run_inc, run_full):  # warm both paths
                fn()
            t0 = time.perf_counter(); run_inc(); t_inc = time.perf_counter() - t0
            t0 = time.perf_counter(); run_full(); t_full = time.perf_counter() - t0

            # correctness: incremental == full restricted to the increment
            idx = spark.read.parquet(index_path)
            got = {
                tuple(r)
                for r in incremental_lsh_candidates(
                    increment, idx, bucket_cap=10**9
                ).collect()
            }
            want = {
                tuple(r)
                for r in minhash_lsh_candidates(
                    history.unionByName(increment), bucket_cap=10**9
                )
                .filter(
                    (F.col("id_a") >= 100 * base) | (F.col("id_b") >= 100 * base)
                )
                .collect()
            }
            assert got, "probe is vacuous: no increment-touching pairs"
            results.append(
                {
                    "history_x": n,
                    "history_docs": n * base,
                    "increment_pairs": len(got),
                    "incremental_s": round(t_inc, 2),
                    "full_recompute_s": round(t_full, 2),
                    "pairs_equal": got == want,
                }
            )
            print(json.dumps(results[-1]), flush=True)

        print(
            json.dumps(
                {
                    "metric": "incremental_dedup_probe",
                    "increment_docs": 500,
                    "incremental_growth_x8": round(
                        results[-1]["incremental_s"] / results[0]["incremental_s"], 2
                    ),
                    "full_growth_x8": round(
                        results[-1]["full_recompute_s"]
                        / results[0]["full_recompute_s"],
                        2,
                    ),
                    "all_pairs_equal": all(r["pairs_equal"] for r in results),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
