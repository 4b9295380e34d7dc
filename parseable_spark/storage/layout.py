"""Z-order (Morton) multi-column clustering — data layout for pruning.

At 100 TB the cheapest query is the one that never reads the file: a
time-sorted layout prunes time predicates (writer.py + manifests) but
scatters every OTHER column across all files, so `user_id = X` reads
the whole partition. Z-ordering interleaves the bits of several
columns' range-normalized values into one sort key, so files become
rectangles in the multi-column space and parquet min/max footer stats
(and the manifests built from them) prune on ANY of the clustered
columns at once — the same layout lever Delta Lake's OPTIMIZE ZORDER BY
and public Databricks/Delta literature describe (public technique;
implemented here from scratch as pure Spark column expressions).

Mechanics:
- numeric/timestamp columns → rank-normalize into [0, 2^bits) using the
  column min/max (one aggregate pass — a layout job's prerogative);
- string columns → xxhash64 bucket in [0, 2^bits): point-equality
  pruning works (a value's bucket is stable), range pruning does not —
  documented, same tradeoff Delta makes for high-cardinality strings;
- the Morton key is a SUM of shift/mask terms over every (bit, column)
  pair — pure JVM-side expressions inside whole-stage codegen, no UDF;
- `cluster_by_zorder` = repartitionByRange(morton) +
  sortWithinPartitions(morton): each output file covers a compact
  Morton range ⇒ tight min/max on every clustered column.

Measured effect: tools/zorder_probe.py (results in SCALE.md) — row
groups whose stats overlap a point+range predicate drop by ~an order of
magnitude vs time-only layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    NumericType,
    TimestampNTZType,
    TimestampType,
)

DEFAULT_BITS = 12  # 4096 buckets per column — plenty for file-level pruning


def _ordered_expr(df: DataFrame, col: str) -> Column | None:
    """Orderable numeric view of a column (NULL for non-finite values),
    or None for hash-bucketed types (strings/complex)."""
    dt = df.schema[col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        # unix_micros needs TIMESTAMP; NTZ casts losslessly (UTC axis)
        return F.unix_micros(F.col(col).cast("timestamp"))
    if isinstance(dt, DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if isinstance(dt, BooleanType):
        return F.col(col).cast("int").cast("double")
    if isinstance(dt, NumericType):
        # NaN/±Inf poison the whole layout under ANSI: max() returns
        # NaN when ANY value is NaN, making every row's scaled value
        # NaN, and NaN.cast(long) THROWS CAST_OVERFLOW — one bad OTel
        # gauge permanently failed every compaction pass on the stream
        # (review finding, empirically confirmed). Non-finite values
        # map to NULL → bucket 0, and the stats aggregate sees NULLs
        # (min/max ignore them), keeping the range finite.
        e = F.col(col).cast("double")
        return F.when(e.isNull() | F.isnan(e) | (F.abs(e) == float("inf")), None).otherwise(e)
    # strings and everything else (arrays, structs, binary): stable
    # hash bucket — point-equality pruning works, range pruning does
    # not (documented trade-off). Previously booleans/dates raised
    # ValueError INSIDE the background compaction pass, so a stream
    # configured with one was never compacted again (review finding).
    return None


def _normalize_all(df: DataFrame, cols: list[str], bits: int) -> list[Column]:
    """Columns → integers in [0, 2^bits): min/max range scaling for
    ordered types, hash buckets for strings. ALL ranges come from one
    aggregate job (a layout pass adds exactly one stats scan, however
    many columns are clustered)."""
    top = (1 << bits) - 1
    ordered = {c: e for c in cols if (e := _ordered_expr(df, c)) is not None}
    stats: dict[str, tuple] = {}
    if ordered:
        aggs = []
        for c, e in ordered.items():
            aggs += [F.min(e).alias(f"__lo_{c}"), F.max(e).alias(f"__hi_{c}")]
        row = df.agg(*aggs).first()
        stats = {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in ordered}
    out = []
    for c in cols:
        if c not in ordered:
            out.append(F.pmod(F.xxhash64(F.col(c)), F.lit(1 << bits)).cast("long"))
            continue
        lo, hi = stats[c]
        if lo is None or hi is None or hi == lo:
            out.append(F.lit(0).cast("long"))
            continue
        scaled = (ordered[c] - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(top))
        out.append(F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(top)))
    return out


def zorder_key(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of the normalized columns, as one codegen'd
    expression (bits × len(cols) shift/mask terms, OR-summed)."""
    if not cols:
        raise ValueError("z-order needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit in a signed 64-bit key")
    norms = _normalize_all(df, cols, bits)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for ci, nc in enumerate(norms):
            key = key + F.shiftleft(
                F.shiftright(nc, b).bitwiseAND(F.lit(1)), b * len(cols) + ci
            )
    return key


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    num_files: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Rewrite a DataFrame into `num_files` Morton-contiguous chunks —
    the compaction/OPTIMIZE-time layout pass. Each output partition
    covers a compact Morton range, so every clustered column's min/max
    is tight per file. (repartitionByRange samples the key — one extra
    job, the standard cost of a layout rewrite.)"""
    # unique temp name: an ingested field literally named __zorder would
    # make the select ambiguous and the drop remove user data (review
    # finding)
    kname = "__zorder"
    while kname in df.columns:
        kname += "_"
    key = zorder_key(df, cols, bits).alias(kname)
    keyed = df.select("*", key)
    return (
        keyed.repartitionByRange(num_files, F.col(kname))
        .sortWithinPartitions(kname)
        .drop(kname)
    )
