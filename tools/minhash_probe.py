"""Probe: minhash signature build strategies at sf0.1.

A: current shingle_rows (posexplode + lead window, one shuffle) →
   groupBy-min signatures (second shuffle).
B: per-row higher-order functions — split/shingle/md5 arrays kept as
   materialized projection attributes, signatures via array_min.
   Zero shuffles; HOF lambdas are interpreted but single-pass.

Both must produce identical signatures (asserted), then timed.
Usage: python tools/minhash_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from parseable_spark.llm import dedup
from parseable_spark.session import get_spark
from parseable_spark.tables import load_table


def signatures_hof(docs, num_hashes=8, n=3):
    w = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    step1 = docs.select("doc_id", w.alias("w"))
    step1 = step1.select(
        "doc_id", F.filter(F.col("w"), lambda x: F.length(x) > 0).alias("w")
    )
    sh = F.when(
        F.size(F.col("w")) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("w")) - n),
            lambda i: F.array_join(F.slice(F.col("w"), i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    step2 = step1.select("doc_id", sh.alias("sh"))
    step3 = step2.select(
        "doc_id", F.transform(F.col("sh"), lambda s: F.md5(s)).alias("dg")
    )
    return step3.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(F.col("dg"), lambda d: F.substring(d, 1 + 4 * k, 4))
            ).alias(f"mh{k}")
            for k in range(num_hashes)
        ],
    ).filter(F.col("mh0").isNotNull())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("minhash-probe")
    docs = load_table(spark, sf_dir, "documents")

    sig_a = dedup.minhash_signatures(dedup.shingle_rows(docs))
    sig_b = signatures_hof(docs)

    # equality: same rows both directions
    diff1 = sig_a.exceptAll(sig_b).count()
    diff2 = sig_b.exceptAll(sig_a).count()
    print(f"equal: {diff1 == 0 and diff2 == 0} (a-b={diff1}, b-a={diff2})")

    for name, df_fn in [("A explode+window", lambda: dedup.minhash_signatures(dedup.shingle_rows(docs))),
                        ("B per-row HOF   ", lambda: signatures_hof(docs))]:
        df_fn().write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df_fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
