"""Duplicate-density probe — the LSH giant-bucket guard under a flood.

Builds a deliberately duplicate-dense corpus (the first D documents of
sf0.1, replicated xN with NO text perturbation, so every document has N
exact copies and every LSH band bucket holds >= N members), then runs
minhash_lsh_candidates with the production bucket_cap and effectively
uncapped, reporting candidate-pair counts and wall times.

Expected shape: uncapped pairs grow ~quadratically in N (N(N-1)/2 per
flooded group); capped pairs grow linearly (N-1 star pairs per giant
bucket). This is the guard VERDICT r1 "What's wrong #2" asked for.

Usage: python tools/dup_density_probe.py [N ...]   (default: 64 256)
Prints one JSON line per (N, mode) + a summary line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from parseable_spark.llm.dedup import minhash_lsh_candidates  # noqa: E402
from parseable_spark.session import get_spark  # noqa: E402
from parseable_spark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
D = 200  # base documents per flood


def flooded_corpus(spark, n: int):
    base = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < D)
    )
    off = D
    parts = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * off)) for i in range(n)
    ]
    whole = parts[0]
    for p in parts[1:]:
        whole = whole.unionByName(p)
    return whole


def run(spark, docs, cap: int):
    minhash_lsh_candidates(docs, bucket_cap=cap).count()  # warm
    t0 = time.perf_counter()
    n_pairs = minhash_lsh_candidates(docs, bucket_cap=cap).count()
    return n_pairs, round(time.perf_counter() - t0, 3)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [64, 256]
    spark = get_spark("dup-density-probe")
    summary = {}
    for n in ns:
        docs = flooded_corpus(spark, n).persist()
        docs.count()  # materialize once; both modes read the same input
        capped_pairs, capped_s = run(spark, docs, 64)
        uncapped_pairs, uncapped_s = run(spark, docs, 10**9)
        docs.unpersist()
        row = {
            "n_copies": n,
            "docs": D * n,
            "capped_pairs": capped_pairs,
            "capped_s": capped_s,
            "uncapped_pairs": uncapped_pairs,
            "uncapped_s": uncapped_s,
        }
        summary[n] = row
        print(json.dumps(row))
    print(
        json.dumps(
            {
                "metric": "dup_density_probe",
                "bucket_cap": 64,
                "pair_reduction": {
                    n: round(r["uncapped_pairs"] / max(r["capped_pairs"], 1), 1)
                    for n, r in summary.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
