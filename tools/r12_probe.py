"""Round-12 optimization probes — A/B each candidate change at sf0.1.

Same discipline as tools/r11_probe.py: assert result-equality between
the current shape (A) and the candidate (B) BEFORE timing; warm +
best-of-3 through the noop sink; interleave A and B rounds so box
drift hits both sides equally.

Probes:
  q12-bloom   runtime Bloom-filter injection for q12's fact-table
              joins (guide §3.2): creation side = the selective
              ASIA-filtered dims, application side = orders/lineitem.
              Spark's injection is gated on size estimates
              (creationSideThreshold / applicationSideScanSizeThreshold)
              tuned for clusters; the probe lowers the application-side
              gate so the filter fires at sf0.1 and measures whether
              the plan change is a local win.
  q04-iso     isolated re-timing of q04/q05 (bench outliers this
              round) — distinguishes a real regression from early-
              bench JVM-warmup noise.

Usage: python tools/r12_probe.py <probe> [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from parseable_spark.session import get_spark
from parseable_spark.tables import load_table


def bench(name, fn, n=3):
    fn().write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.3f}s", flush=True)
    return best


def assert_equal(a_df, b_df, label):
    d1 = a_df.exceptAll(b_df).count()
    d2 = b_df.exceptAll(a_df).count()
    ok = d1 == 0 and d2 == 0
    print(f"{label} equal: {ok} (a-b={d1}, b-a={d2})", flush=True)
    if not ok:
        raise SystemExit(f"{label}: NOT EQUAL — candidate rejected")


BLOOM_CONFS = {
    # the injection is on by default in Spark 4 but gated on size
    # estimates sized for clusters; at sf0.1 the application-side scan
    # (~8 MB parquet) is far under the 10 GB gate, so nothing fires
    # without lowering it. creationSideThreshold stays >= the dim-side
    # estimate so the ASIA-filtered creation sides qualify.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "64MB",
}


def probe_q12_bloom(spark, sf_dir):
    from parseable_spark.queries.relational import q12_local_supplier_volume

    def set_confs(on: bool):
        for k, v in BLOOM_CONFS.items():
            if on:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)

    def run_a():
        set_confs(False)
        return q12_local_supplier_volume(spark, sf_dir)

    def run_b():
        set_confs(True)
        return q12_local_supplier_volume(spark, sf_dir)

    # equality (computed under B confs on both frames is fine — bloom
    # filters never change results, only bytes; compute A first so the
    # except runs under default confs)
    a = run_a()
    set_confs(True)
    b = q12_local_supplier_volume(spark, sf_dir)
    assert_equal(a, b, "q12 bloom")
    set_confs(False)
    # does the filter actually appear?
    set_confs(True)
    plan = b._jdf.queryExecution().executedPlan().toString()
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        q12_local_supplier_volume(spark, sf_dir).explain("formatted")
    txt = buf.getvalue()
    print("might_contain in B plan:", "might_contain" in txt, flush=True)
    set_confs(False)
    # interleaved timing: 3 rounds of (A best-of-2, B best-of-2)
    for rnd in range(3):
        bench(f"A q12 default  (round {rnd})", run_a, n=2)
        bench(f"B q12 bloom    (round {rnd})", run_b, n=2)
    set_confs(False)


def probe_q12_bloom_shuffle(spark, sf_dir):
    """The 100 TB-shaped A/B: with broadcast disabled, every q12 join
    is shuffle-shaped (the only shape the fact tables can take at
    warehouse scale) — does Bloom injection on the orders/lineitem
    scans pay for itself there?"""
    from parseable_spark.queries.relational import q12_local_supplier_volume

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def set_confs(on: bool):
        for k, v in BLOOM_CONFS.items():
            if on:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)

    def run_a():
        set_confs(False)
        return q12_local_supplier_volume(spark, sf_dir)

    def run_b():
        set_confs(True)
        return q12_local_supplier_volume(spark, sf_dir)

    a = run_a()
    set_confs(True)
    b = q12_local_supplier_volume(spark, sf_dir)
    assert_equal(a, b, "q12 shuffle-shape bloom")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        q12_local_supplier_volume(spark, sf_dir).explain("formatted")
    txt = buf.getvalue()
    n_bloom = txt.count("might_contain")
    print(f"might_contain count in B plan: {n_bloom}", flush=True)
    Path("plans/r12").mkdir(parents=True, exist_ok=True)
    Path("plans/r12/q12_local_supplier_volume_bloomdemo.txt").write_text(txt)
    set_confs(False)
    for rnd in range(3):
        bench(f"A q12 shuffle-shape        (round {rnd})", run_a, n=2)
        bench(f"B q12 shuffle-shape +bloom (round {rnd})", run_b, n=2)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    set_confs(False)


def probe_q04_iso(spark, sf_dir):
    from parseable_spark.queries.product import (
        q04_counts_topk_nullsafe,
        q18_counts_histogram,
    )
    from parseable_spark.queries.relational import q05_date_bin_histogram

    for rnd in range(3):
        bench(f"q04 iso (round {rnd})", lambda: q04_counts_topk_nullsafe(spark, sf_dir), n=3)
        bench(f"q05 iso (round {rnd})", lambda: q05_date_bin_histogram(spark, sf_dir), n=3)
        bench(f"q18 iso (round {rnd})", lambda: q18_counts_histogram(spark, sf_dir), n=3)


def main():
    probe = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("r12-probe")
    {
        "q12-bloom": probe_q12_bloom,
        "q12-bloom-shuffle": probe_q12_bloom_shuffle,
        "q04-iso": probe_q04_iso,
    }[probe](spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
