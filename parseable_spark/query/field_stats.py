"""Field statistics — per-field top-K values + distinct counts.

Reference: src/storage/field_stats.rs computes, per field, the total
count, distinct count (hand-rolled HyperLogLog, 2^12 registers), and
exact top-K distinct values; the read side (build_stats_sql :991-1100)
is a ROW_NUMBER window over grouped sums. Spark-side we use
approx_count_distinct (HLL++, same precision class) for the sketch and
a rank window for exact top-K.
"""

from __future__ import annotations

import re as _re


def _ident(name: str) -> str:
    """Validate + backtick a stream/field identifier before SQL
    interpolation — same gate the alert condition builders use (r7
    review: raw interpolation made dotted OTel fields parse as struct
    access and left these builders injectable if ever fed unvalidated
    names). The WHOLE name is backticked: field-stats fields come from
    the flat ingest registry, where `http.method` is one column, not
    struct access."""
    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.\-]*", str(name)):
        raise ValueError(f"invalid identifier: {name!r}")
    return f"`{name}`"


def _str_lit(s: str) -> str:
    """Single-quoted SQL string literal (backslash first — Spark's
    default lexer treats \\' as an escaped quote)."""
    return "'" + str(s).replace("\\", "\\\\").replace("'", "''") + "'"


def field_top_k_sql(stream: str, fields: list[str], k: int) -> str:
    """UNION ALL of per-field top-K value counts, ranked deterministically.

    Output: field_name, field_value (string), cnt, rn. Works identically
    on Spark SQL and any ANSI engine — values cast to string so
    heterogeneous field types union cleanly (reference stores them as
    distinct_value strings in the pstats stream).

    Scale note: the top-K is taken with a deterministic ORDER BY + LIMIT
    in the inner query — Spark compiles that to TakeOrderedAndProject
    (parallel partial top-K per partition, merged on the driver), so no
    stage ever sees more than k rows per field. The ROW_NUMBER window
    runs over only the <=k survivors, PARTITION BY field_name, which
    avoids the single-partition global window the naive rank-then-filter
    formulation produces (reference build_stats_sql, field_stats.rs:991-
    1100, is rank-then-filter — correct there because its engine sorts
    locally; on Spark that plan moves every distinct value to one task).
    """
    parts = []
    for f in fields:
        fq, fl = _ident(f), _str_lit(f)
        parts.append(
            f"""
            SELECT {fl} AS field_name, CAST({fq} AS STRING) AS field_value,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM {_ident(stream)}
            GROUP BY CAST({fq} AS STRING)
            ORDER BY cnt DESC, field_value ASC NULLS LAST
            LIMIT {int(k)}
            """
        )
    union = " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)
    # The window runs AFTER the union so field_name is a genuinely varying
    # column: a per-branch `PARTITION BY '<literal>'` would be constant-
    # folded away by Catalyst, silently reverting to a global window.
    return f"""
        SELECT field_name, field_value, cnt,
               ROW_NUMBER() OVER (
                   PARTITION BY field_name
                   ORDER BY cnt DESC, field_value ASC NULLS LAST) AS rn
        FROM ({union})
    """


def field_cardinality_sql(stream: str, fields: list[str]) -> str:
    """Exact + approximate distinct counts per field (HLL++ replaces the
    reference's hand-rolled HyperLogLog, field_stats.rs:595+).

    NULL semantics match the write side (compute_field_stats): NULLs
    count toward total_count and appear as the literal 'NULL' distinct
    value — count(f)/count(DISTINCT f) excluded them, so the live
    cardinality query showed phantom drift against persisted pstats on
    any NULL-bearing field."""
    parts = [
        f"""
        SELECT {_str_lit(f)} AS field_name,
               CAST(count(*) AS BIGINT) AS total_count,
               CAST(count(DISTINCT coalesce(CAST({_ident(f)} AS STRING), '{NULL_VALUE}'))
                    AS BIGINT) AS distinct_count,
               CAST(approx_count_distinct(
                    coalesce(CAST({_ident(f)} AS STRING), '{NULL_VALUE}'))
                    AS BIGINT) AS approx_distinct
        FROM {_ident(stream)}
        """
        for f in fields
    ]
    return " UNION ALL ".join(parts)


# --- write side: the pstats dataset ----------------------------------------

DATASET_STATS_STREAM_NAME = "pstats"  # field_stats.rs:84
DATASET_STATS_CUSTOM_PARTITION = "dataset_name"  # :85
NULL_VALUE = "NULL"  # :89


def compute_field_stats(df, dataset_name: str, fields=None, k: int = 5):
    """Per-field stats rows in the reference's pstats shape
    (FieldStat/DistinctStat, field_stats.rs:99-110): one row per field
    with total count, distinct count, and the exact top-K
    (value, count) pairs.

    Single-pass at any scale: all fields are stacked into
    (field_name, value) pairs with one explode, so the whole job is ONE
    shuffle on (field_name, value) + one on field_name — not a scan per
    field like the reference's per-column rayon loop. NULLs count as
    the literal "NULL" (reference NULL_VALUE). distinct_count uses
    exact count here; swap approx=True for approx_count_distinct
    (HLL++, same precision class as the reference's 2^12-register HLL)
    when fields are high-cardinality.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    fields = fields or df.columns
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("field_name"),
                        # backticks: dotted flat fields (OTel
                        # `http.method`) must not parse as struct access
                        F.coalesce(
                            F.col(f"`{f}`").cast("string"), F.lit(NULL_VALUE)
                        ).alias("distinct_value"),
                    )
                    for f in fields
                ]
            )
        ).alias("s")
    ).select("s.*")
    vc = stacked.groupBy("field_name", "distinct_value").agg(
        F.count(F.lit(1)).alias("count")
    )
    w = Window.partitionBy("field_name").orderBy(
        F.desc("count"), F.asc("distinct_value")
    )
    ranked = vc.withColumn("rn", F.row_number().over(w))
    per_field = ranked.groupBy("field_name").agg(
        F.sum("count").cast("bigint").alias("count"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_count"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("rn") <= k,
                        F.struct("rn", "distinct_value", F.col("count").alias("cnt")),
                    )
                )
            ),
            lambda s: F.struct(
                s["distinct_value"].alias("distinct_value"),
                s["cnt"].cast("long").alias("count"),
            ),
        ).alias("distinct_stats"),
    )
    return per_field.select(
        F.lit(dataset_name).alias(DATASET_STATS_CUSTOM_PARTITION),
        "field_name",
        "count",
        "distinct_count",
        "distinct_stats",
    )
