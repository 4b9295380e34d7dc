"""Counts API — histogram bins + top-K grouped counts as generated SQL.

Reference: src/query/mod.rs:665-735 builds
  SELECT DATE_BIN(...) AS start_time, COUNT(*) ... GROUP BY start_time
and, with a group_by field, a 3-CTE query (grouped_counts, top_groups,
null-safe inner join back). We generate the same shapes in Spark SQL;
DATE_BIN becomes anchored floor arithmetic (functions.date_bin_sql).
"""

from __future__ import annotations

from ..catalog.manifest import ISO_MICRO_FMT
from ..functions import date_bin_sql

# bin tiers mirror the reference's interval selection
# (src/utils/time.rs:68-94): 1m / 5m / 1h / 1d depending on range width.
_TIERS = [(60 * 60, 60), (6 * 3600, 300), (3 * 86400, 3600), (None, 86400)]


def pick_bin_seconds(range_seconds: int) -> int:
    for ceiling, bin_s in _TIERS:
        if ceiling is None or range_seconds <= ceiling:
            return bin_s
    return 86400


def histogram_sql(
    stream: str,
    time_col: str,
    bin_seconds: int,
    where: str | None = None,
    anchor_epoch: int = 0,
) -> str:
    cond = f"WHERE {where}" if where else ""
    bin_expr = date_bin_sql(time_col, bin_seconds, anchor_epoch)
    return (
        f"SELECT {bin_expr} AS bin_epoch, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM {stream} {cond} GROUP BY bin_epoch"
    )


def top_k_counts_sql(
    stream: str,
    time_col: str,
    group_col: str,
    bin_seconds: int,
    k: int,
    where: str | None = None,
    anchor_epoch: int = 0,
) -> str:
    """3-CTE top-K shape with null-safe join (reference mod.rs:716-732).
    ``anchor_epoch`` must match the histogram query's anchor (the
    reference anchors DATE_BIN at the query start, mod.rs:676-679) —
    without it the grouped bins landed at epoch-0 multiples while the
    ungrouped histogram binned at start+k·bin (r6 review)."""
    cond = f"WHERE {where}" if where else ""
    bin_expr = date_bin_sql(time_col, bin_seconds, anchor_epoch)
    return f"""
        WITH grouped_counts AS (
            SELECT {group_col} AS grp, {bin_expr} AS bin_epoch,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM {stream} {cond}
            GROUP BY grp, bin_epoch
        ), top_groups AS (
            SELECT grp FROM grouped_counts
            GROUP BY grp ORDER BY sum(cnt) DESC, grp LIMIT {k}
        )
        SELECT g.grp AS {group_col}, g.bin_epoch, g.cnt
        FROM grouped_counts g
        INNER JOIN top_groups t ON g.grp <=> t.grp
    """


def fast_count(
    engine, sql: str, stores: dict, start=None, end=None
) -> "object | None":
    """Answer a bare COUNT(*) from manifest metadata when the plan shape
    allows (reference route: src/handlers/http/query.rs:186-256 —
    detection, then manifest num_rows sums instead of a scan). Returns
    a one-row DataFrame matching the query's output alias, or None when
    the query must actually execute.

    With a `start`/`end` window (UTC-naive datetimes, the engine axis),
    the count comes from files FULLY inside the window plus in-window
    staging rows; any boundary-straddling file forces a real scan
    (None) — the all-time manifest total must never answer a windowed
    query (review finding)."""
    hit = engine.detect_bare_count(sql)
    if hit is None:
        return None
    stream, alias = hit
    # case-insensitive: the analyzed plan lower-cases view names
    canon = {k.lower(): k for k in stores}
    store = stores.get(canon.get(stream.lower(), stream))
    if store is None:
        return None
    if start is None and end is None:
        n = store.count_fast_path()
    else:
        iso = lambda d: d.strftime(ISO_MICRO_FMT) if d else None  # noqa: E731
        lo, hi = iso(start), iso(end)
        n = 0
        for f in store.manifest.files:
            tb = f.time_bounds(store.time_col)
            if tb is None:
                return None  # unknown bounds: cannot prove containment
            f_lo, f_hi = tb
            if (hi is not None and f_lo >= hi) or (lo is not None and f_hi < lo):
                continue  # fully outside
            inside = (lo is None or f_lo >= lo) and (hi is None or f_hi < hi)
            if not inside:
                return None  # straddles a boundary: must scan
            # the real windowed scan (ts >= lo AND ts < hi) drops
            # NULL-timestamp rows, and parquet min/max stats ignore
            # NULLs — so containment says nothing about them. Subtract
            # the file's known null count; unknown → must scan.
            nulls = (f.columns.get(store.time_col) or {}).get("nulls")
            if nulls is None:
                return None
            n += f.num_rows - nulls
        for b in store._staging:
            for rec in b.records:
                ts = rec.get(store.time_col)
                if ts is None:
                    continue
                t = ts.strftime(ISO_MICRO_FMT)
                if (lo is None or t >= lo) and (hi is None or t < hi):
                    n += 1
    # StructType, not a DDL string: an alias containing a backtick
    # (SELECT COUNT(*) AS `a``b` — legal) broke the DDL parse into a
    # 500 where the scan path would have answered (r7 review)
    from pyspark.sql.types import LongType, StructField, StructType

    return engine.spark.createDataFrame(
        [(n,)], StructType([StructField(alias, LongType(), False)])
    )
