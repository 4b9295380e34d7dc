"""Skew-join probe: measured evidence for the two mitigation paths.

Builds a pathologically skewed join (one key owns half the fact rows —
the case partition-hash shuffles cannot balance) against a non-
broadcastable dim side, then times three plans:

1. plain sort-merge join, AQE off  — one reducer owns the hot key;
2. AQE on with skew-join splitting — runtime re-plan splits the hot
   partition (thresholds lowered so the splitter engages at probe
   scale; at 100 TB the defaults engage on their own);
3. functions.salted_join, AQE off  — deterministic salt spreads the
   hot key over N buckets; the explicit fallback for skew so extreme
   a single key exceeds what partition splitting can rebalance.

Prints one JSON line per plan + a summary. Run:
  python tools/skew_probe.py [n_rows] [hot_fraction]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from parseable_spark.functions import salted_join
    from parseable_spark.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_frac_denom = 2  # hot key owns 1/2 of the fact side

    spark = get_spark("skew-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join

    # fact: key 0 owns n/2 rows; the rest spread over 1000 keys
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % hot_frac_denom == 0, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        (F.col("id") * 17 % 1000).alias("payload"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("dim_val")
    )

    def timed(name: str, df) -> float:
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        print(json.dumps({"plan": name, "wall_s": dt}))
        return dt

    agg = lambda j: j.groupBy("dim_val").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    plain = timed("sortmerge_no_aqe", agg(fact.join(dim, "k")))

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # engage the splitter at probe scale (defaults are sized for real
    # clusters: 256 MiB partitions; at 100 TB they fire untouched)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    aqe = timed("sortmerge_aqe_skewjoin", agg(fact.join(dim, "k")))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    salted = timed(
        "salted_join_no_aqe", agg(salted_join(fact, dim, "k", salt_buckets=32))
    )

    # correctness: all three plans agree
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    a = {r["dim_val"]: (r["n"], r["s"]) for r in agg(fact.join(dim, "k")).collect()}
    b = {
        r["dim_val"]: (r["n"], r["s"])
        for r in agg(salted_join(fact, dim, "k", salt_buckets=32)).collect()
    }
    assert a == b, "salted join changed the answer"

    print(
        json.dumps(
            {
                "metric": "skew_probe",
                "n_rows": n_rows,
                "hot_key_fraction": 1 / hot_frac_denom,
                "wall_s": {
                    "sortmerge_no_aqe": plain,
                    "sortmerge_aqe_skewjoin": aqe,
                    "salted_join_no_aqe": salted,
                },
                "speedup_aqe": round(plain / aqe, 2),
                "speedup_salted": round(plain / salted, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
