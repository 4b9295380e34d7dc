"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink — unlike count(),
that computes every output column (count() lets Catalyst prune the
projections, under-measuring map-heavy queries) while keeping
execution fully distributed (no driver collect). One untimed warm run
per query (JVM/codegen + page cache), then one timed run.
Run: python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# headline set: scan-agg, shuffle join, window, LSH dedup pipeline,
# vector search, text analysis — the engine's load-bearing shapes.
HEADLINE = [
    "q01_pricing_summary",
    "q04_group_topk_nullsafe",
    "q05_date_bin_histogram",
    "q07_window_rownum",
    "q11_shipping_priority",
    "q12_local_supplier_volume",
    "q18_counts_histogram",
    "q21_field_stats_topk",
    "q26_dedup_jaccard_verified",
    "q28_knn_bruteforce",
    "q31_text_quality",
    "q33_token_counts",
    "q52_asof_join",
    "q54_repetition_filters",
    "q56_contamination",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from parseable_spark.queries import registry
    from parseable_spark.session import get_spark

    spark = get_spark("bench")
    specs = registry()

    # warm the session (JVM, file listing) outside the timed region
    spark.range(1).count()

    def run(name: str) -> None:
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        run(name)  # warm: codegen/broadcast/page-cache outside timing
        best = float("inf")
        for _ in range(2):  # min-of-2 damps scheduler/GC noise
            t0 = time.perf_counter()
            run(name)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
