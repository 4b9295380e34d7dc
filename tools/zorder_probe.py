"""Z-order layout probe — measures PRUNING, not just time.

Writes the sf0.1 events table two ways (same file count):
  A) time-sorted (the ingest layout writer.py produces), and
  B) z-ordered by (user_id, ts) via storage/layout.cluster_by_zorder,
then evaluates a point+range predicate (`user_id = X AND ts in a 2-day
window`) against BOTH layouts two independent ways:

1. footer-level truth: read every parquet row group's min/max stats
   with pyarrow and count the row groups whose stats OVERLAP the
   predicate — the exact set a stats-pruning reader must touch;
2. Spark wall time of the filtered scan (count action, warm).

The footer count is the deterministic signal (timing on 25 MB is
noise); at 100 TB the overlap ratio IS the fraction of data read.

Usage: python tools/zorder_probe.py [n_files=16]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from parseable_spark.session import get_spark  # noqa: E402
from parseable_spark.storage.layout import cluster_by_zorder  # noqa: E402
from parseable_spark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def overlap_rowgroups(path: str, user_id: int, ts_lo, ts_hi) -> tuple[int, int]:
    """(#row groups whose [min,max] stats overlap the predicate, total)."""
    hit = total = 0
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            su = g.column(names["user_id"]).statistics
            st = g.column(names["ts"]).statistics
            if su is None or st is None:
                hit += 1  # no stats: must read
                continue
            if su.min <= user_id <= su.max and st.min <= ts_hi and st.max >= ts_lo:
                hit += 1
    return hit, total


def timed_scan(spark, path: str, user_id: int, lo, hi) -> float:
    df = (
        spark.read.parquet(path)
        .filter((F.col("user_id") == user_id) & F.col("ts").between(lo, hi))
    )
    df.count()  # warm
    t0 = time.perf_counter()
    df.count()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    base = Path("/tmp/parseable_spark_zorder")
    if base.exists():
        shutil.rmtree(base)
    spark = get_spark("zorder-probe")
    ev = load_table(spark, SF_DIR, "events")

    # A: the ingest layout — time-sorted, same file count
    (
        ev.repartitionByRange(n_files, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(str(base / "time_sorted"))
    )
    # B: z-ordered by (user_id, ts)
    cluster_by_zorder(ev, ["user_id", "ts"], n_files).write.parquet(
        str(base / "zorder")
    )

    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    import datetime as dt

    ts_lo = lo + (hi - lo) / 3
    ts_hi = ts_lo + dt.timedelta(days=2)
    user_id = int(ev.select("user_id").first()[0])

    # three predicate shapes: the time-selective one a time-sorted
    # layout is built for, the entity-selective one it can't prune at
    # all, and the combined shape
    preds = {
        "time_only": (None, ts_lo, ts_hi),
        "user_only": (user_id, lo, hi),
        "user_and_time": (user_id, ts_lo, ts_hi),
    }
    out = {"metric": "zorder_probe", "n_files": n_files, "user_id": user_id}
    for pname, (uid, plo, phi) in preds.items():
        row = {}
        for label in ("time_sorted", "zorder"):
            path = str(base / label)
            if uid is None:
                # time-only: overlap = ts-stats only
                hit = total = 0
                for f in sorted(Path(path).glob("*.parquet")):
                    md = pq.ParquetFile(str(f)).metadata
                    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
                    for rg in range(md.num_row_groups):
                        total += 1
                        st = md.row_group(rg).column(names["ts"]).statistics
                        if st is None or (st.min <= phi and st.max >= plo):
                            hit += 1
            else:
                hit, total = overlap_rowgroups(path, uid, plo, phi)
            row[label] = {"rowgroups": f"{hit}/{total}",
                          "read_fraction": round(hit / total, 3)}
        row["gain"] = round(
            row["time_sorted"]["read_fraction"]
            / max(row["zorder"]["read_fraction"], 1e-9),
            1,
        )
        out[pname] = row
    # wall time for the layout-adversarial shape (user-only, full history)
    for label in ("time_sorted", "zorder"):
        out[f"user_only_scan_s_{label}"] = timed_scan(
            spark, str(base / label), user_id, lo, hi
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
