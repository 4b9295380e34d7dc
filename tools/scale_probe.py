"""Scale probe — measure how headline plans scale with data volume.

Replicates the driver's sf0.1 tables xN into a temp parquet dir with
key/time offsets (ids shifted per replica so joins keep 1:N fan-out
instead of becoming N:N; event timestamps shifted by a full timeline
span so the time axis grows like real retention; document text gets a
per-replica suffix so dedup load stays realistic instead of every doc
gaining N exact copies), then times a representative query per plan
shape at 1x and Nx and reports the wall-clock ratio.

A plan that "would survive 100x" should scale ~linearly (ratio ≈ N on
a fixed-core machine, modulo constant overheads that amortize AWAY at
larger inputs — ratios well below N are fine, well above N are red
flags: super-linear shuffles, driver collects, or quadratic joins).

Usage: python tools/scale_probe.py [N] [out_dir]
Prints one JSON line per query + a summary line.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from parseable_spark.session import get_spark  # noqa: E402
from parseable_spark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

# per-table integer key columns to offset per replica (keeps PK/FK
# relationships intact across replicas — replica i joins only replica i)
KEY_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SMALL_DIMS = ("region", "nation", "supplier", "part")  # copied, not replicated


def replicate(spark, out_dir: str, n: int) -> None:
    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    for t in SMALL_DIMS:
        load_table(spark, SF_DIR, t).write.parquet(f"{out}/{t}.parquet")
    for t, keys in KEY_COLS.items():
        df = load_table(spark, SF_DIR, t)
        offsets = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
        span = None
        if t == "events":
            lo, hi = df.agg(F.min("ts"), F.max("ts")).first()
            span = int((hi - lo).total_seconds()) + 1
        parts = []
        for i in range(n):
            r = df
            for k, off in offsets.items():
                r = r.withColumn(k, F.col(k) + F.lit(i * off))
            if span is not None:
                r = r.withColumn(
                    "ts", F.timestamp_add("SECOND", F.lit(i * span), F.col("ts"))
                )
            if t == "documents" and i > 0:
                # rotate consonants per replica: changes ~every shingle,
                # so replicas are NOT near-dups of each other and the
                # corpus's near-dup density stays constant per replica
                # (a trailing-suffix perturbation left replicas colliding
                # in LSH buckets → quadratic candidate growth, an
                # artifact, not a plan property)
                src = "bcdfghklmnprstvw"
                dst = src[i % len(src):] + src[: i % len(src)]
                r = r.withColumn("text", F.translate("text", src, dst))
            parts.append(r)
        whole = parts[0]
        for p in parts[1:]:
            whole = whole.unionByName(p)
        whole.write.parquet(f"{out}/{t}.parquet")


def timed(fn, *args) -> float:
    fn(*args).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(*args).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/parseable_spark_scale"
    spark = get_spark("scale-probe")
    import __spark_entry__ as entry

    qs = entry.queries()
    probes = [  # one per load-bearing plan shape
        "q01_pricing_summary",  # fact scan + hash agg
        "q05_date_bin_histogram",  # time-binned agg over events
        "q12_local_supplier_volume",  # 5-way join, broadcast dims
        "q25_dedup_minhash_verified",  # LSH shuffle + verify join
        "q28_knn_bruteforce",  # vector fold + top-k
        "q14_repetition_filters",  # explode-heavy text pipeline
        "q08_asof_join",  # union + window point-in-time join
    ]
    t0 = time.perf_counter()
    replicate(spark, out_dir, n)
    build_s = round(time.perf_counter() - t0, 3)

    results = {}
    for q in probes:
        base = timed(qs[q], spark, SF_DIR)
        big = timed(qs[q], spark, out_dir)
        ratio = round(big / base, 2) if base > 0 else None
        results[q] = {"base_s": base, "xN_s": big, "ratio": ratio}
        print(json.dumps({"query": q, "n": n, **results[q]}))
    lin = {q: r["ratio"] for q, r in results.items()}
    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "replication": n,
                "build_s": build_s,
                "ratios": lin,
                "verdict": "sublinear-or-linear"
                if all(r is not None and r <= n * 1.25 for r in lin.values())
                else "CHECK: super-linear query present",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
