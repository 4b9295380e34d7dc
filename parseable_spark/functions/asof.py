"""As-of (point-in-time) join — a custom operator Spark lacks.

For each left row, attach the latest right row whose timestamp is <=
the left row's timestamp, per join key (LEFT OUTER semantics: left rows
with no prior right row keep nulls). The reference engine has no such
operator (its closest shape is the log-context anchor window,
src/handlers/http/query_context.rs); it is the canonical event-to-state
attribution primitive a training-data / observability pipeline needs
(e.g. "most recent click before each purchase").

Implementation is the scalable union+window plan, NOT a range join:

    union(left tagged side=1, right tagged side=0)
      -> window last(value, ignoreNulls) over
           (PARTITION BY keys ORDER BY ts, side, right_order
            ROWS UNBOUNDED PRECEDING..CURRENT ROW)
      -> filter side=1

One hash shuffle on the join keys + one sort within partitions; no
broadcast, no per-row Python, no driver loop — the same plan shape at
100 TB, with AQE free to split skewed key partitions at the sort stage.
A naive `l.ts >= r.ts` range join would be O(rows_l x rows_r) per key;
this is O((rows_l + rows_r) log) per partition.

Tie semantics match DuckDB's ASOF JOIN (`ON l.key = r.key AND
l.ts >= r.ts`): equal timestamps DO match (right sorts before left at
the same ts), and among right rows sharing (key, ts) the one greatest
under `right_order` wins, making the result deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_RTS = "__asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    right_order: Sequence[str] = (),
    matched_ts_col: str | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Point-in-time LEFT join of `right` onto `left`.

    right_cols: right columns to attach (default: all non-key,
      non-timestamp columns). Names must not collide with left columns —
      alias on the right DataFrame first.
    right_order: extra right columns breaking ties among right rows with
      identical (keys, right_ts); the greatest wins.
    matched_ts_col: if set, also emit the matched right timestamp under
      this name.
    tolerance_seconds: if set, matches older than this are nulled out
      (row is kept — LEFT semantics).
    """
    keys = list(keys)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    right_cols = list(right_cols)
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")

    l_payload = [c for c in left.columns if c not in (*keys, left_ts)]
    r_order = [c for c in right_order]

    # the right payload travels as ONE struct so the fill is row-atomic:
    # per-column last(ignorenulls) would stitch values from DIFFERENT
    # right rows whenever a payload column is null (review finding —
    # (price from ts=2, qty from ts=1) is a row that never existed)
    _PACK = "__asof_right"
    r_struct_type = (
        "struct<"
        + ",".join(
            [f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in right_cols]
            + [f"__rts:{right.schema[right_ts].dataType.simpleString()}"]
        )
        + ">"
    )
    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in l_payload],
        F.lit(None).cast(r_struct_type).alias(_PACK),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__ord_{c}")
            for c in r_order
        ],
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
        F.struct(
            *[F.col(c) for c in right_cols], F.col(right_ts).alias("__rts")
        ).alias(_PACK),
        *[F.col(c).alias(f"__ord_{c}") for c in r_order],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__asof_ts").asc(),
            F.col(_SIDE).asc(),
            *[F.col(f"__ord_{c}").asc() for c in r_order],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    packed = F.last(_PACK, ignorenulls=True).over(w)
    filled = l_side.unionByName(r_side).select(
        *keys,
        "__asof_ts",
        F.col(_SIDE),
        *[F.col(c) for c in l_payload],
        *[packed.getField(c).alias(c) for c in right_cols],
        packed.getField("__rts").alias(_RTS),
    )

    out = filled.filter(F.col(_SIDE) == 1)
    if tolerance_seconds is not None:
        # timestampdiff works for TIMESTAMP and TIMESTAMP_NTZ alike
        # (a plain cast-to-long is rejected for NTZ). MICROSECOND, not
        # SECOND: SECOND truncates sub-second overage, keeping matches
        # that are up to 1s past the tolerance — the same granularity
        # trap rangejoin.py:37-40 documents.
        stale: Column = F.col(_RTS).isNull() | (
            F.expr(f"timestampdiff(MICROSECOND, {_RTS}, __asof_ts)")
            > F.lit(int(tolerance_seconds) * 1_000_000)
        )
        out = out.select(
            *keys,
            "__asof_ts",
            F.col(_SIDE),
            *[F.col(c) for c in l_payload],
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in right_cols],
            F.when(stale, F.lit(None)).otherwise(F.col(_RTS)).alias(_RTS),
        )

    keep = [*keys, F.col("__asof_ts").alias(left_ts), *l_payload, *right_cols]
    if matched_ts_col is not None:
        keep.append(F.col(_RTS).alias(matched_ts_col))
    return out.select(*keep)
