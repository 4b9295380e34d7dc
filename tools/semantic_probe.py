"""Scale probe for the semantic operators (llm/semantic.py).

Replicates sf0.1 embeddings xN (vec_id offset per replica; vectors
perturbed per replica on one dimension so replicas are near-dups of
the originals — the realistic load for semantic dedup) and measures:

1. kmeans_fit (3 iterations) — expected ~linear: per-iteration work is
   one broadcast argmax + one (cluster, dim) aggregate.
2. semantic_dedup WITHOUT a cluster cap — expected SUPER-linear:
   within-cluster pairs grow quadratically as clusters fill (the
   inherent SemDeDup term; this is the measurement that justifies the
   guard).
3. semantic_dedup WITH cluster_cap — expected ~linear: giant clusters
   degrade to star comparisons, output stays bounded.

Usage: python tools/semantic_probe.py [N]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from parseable_spark.llm import semantic  # noqa: E402
from parseable_spark.session import get_spark  # noqa: E402
from parseable_spark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicated(spark, n: int):
    emb = load_table(spark, SF_DIR, "embeddings")
    total = emb.count()
    parts = []
    for i in range(n):
        shifted = emb.select(
            (F.col("vec_id") + i * total).alias("vec_id"),
            # replica i>0 perturbs one dimension slightly: near-dup of
            # the original, not an exact copy
            F.transform(
                "embedding",
                lambda x, idx: F.when(idx == i % 64, x + F.lit(0.001 * i)).otherwise(x),
            ).alias("embedding"),
        )
        parts.append(shifted)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()  # isolate generation cost from the probe


def timed(fn) -> float:
    fn()  # warm
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("semantic-probe")
    base = replicated(spark, 1)
    big = replicated(spark, n)

    def fit(df):
        return lambda: semantic.kmeans_fit(df, k=8, max_iter=3)

    def dedup(df, cap):
        return lambda: semantic.semantic_dedup(
            df, k=8, threshold=0.999, max_iter=2, cluster_cap=cap
        ).write.format("noop").mode("overwrite").save()

    results = {}
    for name, f1, fn_big in [
        ("kmeans_fit", fit(base), fit(big)),
        ("semantic_dedup_uncapped", dedup(base, 1 << 30), dedup(big, 1 << 30)),
        ("semantic_dedup_capped", dedup(base, 256), dedup(big, 256)),
    ]:
        b = timed(f1)
        g = timed(fn_big)
        results[name] = {"base_s": b, "xN_s": g, "ratio": round(g / b, 2)}
        print(json.dumps({"probe": name, "n": n, **results[name]}))
    print(
        json.dumps(
            {
                "metric": "semantic_scale_probe",
                "replication": n,
                "ratios": {k: v["ratio"] for k, v in results.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
