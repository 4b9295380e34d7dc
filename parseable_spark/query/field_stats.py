"""Field statistics — per-field top-K values + distinct counts.

Reference: src/storage/field_stats.rs computes, per field, the total
count, distinct count (hand-rolled HyperLogLog, 2^12 registers), and
exact top-K distinct values; the read side (build_stats_sql :991-1100)
is a ROW_NUMBER window over grouped sums. Spark-side we use
approx_count_distinct (HLL++, same precision class) for the sketch and
a rank window for exact top-K.
"""

from __future__ import annotations


def field_top_k_sql(stream: str, fields: list[str], k: int) -> str:
    """UNION ALL of per-field top-K value counts, ranked deterministically.

    Output: field_name, field_value (string), cnt, rn. Works identically
    on Spark SQL and any ANSI engine — values cast to string so
    heterogeneous field types union cleanly (reference stores them as
    distinct_value strings in the pstats stream).
    """
    parts = []
    for f in fields:
        parts.append(
            f"""
            SELECT '{f}' AS field_name, CAST({f} AS STRING) AS field_value,
                   CAST(count(*) AS BIGINT) AS cnt,
                   ROW_NUMBER() OVER (ORDER BY count(*) DESC, CAST({f} AS STRING) ASC) AS rn
            FROM {stream}
            GROUP BY CAST({f} AS STRING)
            """
        )
    union = " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)
    return f"SELECT field_name, field_value, cnt, rn FROM ({union}) WHERE rn <= {k}"


def field_cardinality_sql(stream: str, fields: list[str]) -> str:
    """Exact + approximate distinct counts per field (HLL++ replaces the
    reference's hand-rolled HyperLogLog, field_stats.rs:595+)."""
    parts = [
        f"""
        SELECT '{f}' AS field_name,
               CAST(count({f}) AS BIGINT) AS total_count,
               CAST(count(DISTINCT {f}) AS BIGINT) AS distinct_count,
               CAST(approx_count_distinct({f}) AS BIGINT) AS approx_distinct
        FROM {stream}
        """
        for f in fields
    ]
    return " UNION ALL ".join(parts)
