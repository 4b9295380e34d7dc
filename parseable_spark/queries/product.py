"""Product-surface queries — generated SQL routed through QueryEngine.

These exercise the reference's API layer (counts histogram, top-K
counts, alerts, field stats, log context) end-to-end: SQL generator →
time-filter injection → Spark SQL → result. Oracles are the DuckDB
equivalents of the same generated shapes.
"""

from __future__ import annotations

from ..functions import duckdb_date_bin_sql
from ..query.alerts import Condition, ConditionGroup, grouped_alert_sql
from ..query.context import log_context_sql
from ..query.counts import histogram_sql, top_k_counts_sql
from ..query.engine import QueryEngine
from ..query.field_stats import field_cardinality_sql, field_top_k_sql
from ..tables import load_table
from . import register


def _engine(spark, sf_dir) -> QueryEngine:
    eng = QueryEngine(spark, time_col="ts")
    eng.register_stream("events", load_table(spark, sf_dir, "events"), time_col="ts")
    return eng


@register(
    "q18_counts_histogram",
    f"""
    SELECT {duckdb_date_bin_sql('ts', 86400)} AS bin_epoch,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-25 00:00:00'
    GROUP BY bin_epoch
    """,
    doc="Counts API histogram: generated DATE_BIN SQL + injected time filter (reference src/query/mod.rs:665-700).",
)
def q18_counts_histogram(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    sql = histogram_sql("events", "ts", 86400)
    return eng.query(sql, "2024-01-05T00:00:00Z", "2024-01-25T00:00:00Z")


@register(
    "q19_counts_topk",
    f"""
    WITH grouped_counts AS (
        SELECT event_type AS grp, {duckdb_date_bin_sql('ts', 21600)} AS bin_epoch,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-22 00:00:00'
        GROUP BY grp, bin_epoch
    ), top_groups AS (
        SELECT grp FROM grouped_counts
        GROUP BY grp ORDER BY sum(cnt) DESC, grp LIMIT 2
    )
    SELECT g.grp AS event_type, g.bin_epoch, g.cnt
    FROM grouped_counts g
    INNER JOIN top_groups t ON g.grp IS NOT DISTINCT FROM t.grp
    """,
    doc="Counts API with group_by: 3-CTE top-K + null-safe join (reference src/query/mod.rs:716-732).",
)
def q19_counts_topk(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    sql = top_k_counts_sql("events", "ts", "event_type", 21600, 2)
    return eng.query(sql, "2024-01-08T00:00:00Z", "2024-01-22T00:00:00Z")


@register(
    "q20_alert_eval",
    """
    SELECT user_id, round(avg(value), 6) AS agg_value
    FROM events
    WHERE (event_type = 'error' AND value > 50.0) OR (event_type = 'purchase' AND value > 150.0)
    GROUP BY user_id HAVING avg(value) > 120.0
    """,
    doc="Alert condition-tree → WHERE + whitelisted aggregate + threshold (reference src/alerts/alerts_utils.rs:94-131, 390-424).",
)
def q20_alert_eval(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    conds = ConditionGroup(
        "OR",
        [
            ConditionGroup(
                "AND",
                [Condition("event_type", "=", "error"), Condition("value", ">", 50.0)],
            ),
            ConditionGroup(
                "AND",
                [Condition("event_type", "=", "purchase"), Condition("value", ">", 150.0)],
            ),
        ],
    )
    sql = grouped_alert_sql("events", "avg", "value", "user_id", ">", 120.0, conds)
    return eng.query(sql)


@register(
    "q21_field_stats_topk",
    """
    WITH u AS (
        SELECT * FROM (
            SELECT 'event_type' AS field_name, CAST(event_type AS VARCHAR) AS field_value,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 2
            ORDER BY cnt DESC, field_value ASC LIMIT 5
        )
        UNION ALL
        SELECT * FROM (
            SELECT 'user_id' AS field_name, CAST(user_id AS VARCHAR) AS field_value,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 2
            ORDER BY cnt DESC, field_value ASC LIMIT 5
        )
    )
    SELECT field_name, field_value, cnt,
           ROW_NUMBER() OVER (
               PARTITION BY field_name
               ORDER BY cnt DESC, field_value ASC) AS rn
    FROM u
    """,
    doc="Field-stats top-K per field: deterministic ORDER BY+LIMIT (TakeOrderedAndProject) then rank over the <=k survivors (reference src/storage/field_stats.rs:991-1100).",
)
def q21_field_stats_topk(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    sql = field_top_k_sql("events", ["event_type", "user_id"], 5)
    return eng.query(sql)


@register(
    "q22_field_cardinality",
    """
    SELECT 'event_type' AS field_name, CAST(count(event_type) AS BIGINT) AS total_count,
           CAST(count(DISTINCT event_type) AS BIGINT) AS distinct_count
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(count(user_id) AS BIGINT), CAST(count(DISTINCT user_id) AS BIGINT)
    FROM events
    """,
    doc="Field cardinality; Spark adds approx_count_distinct (HLL++) replacing the reference's hand-rolled HLL (field_stats.rs:595+) — exact columns oracle-checked, sketch checked in unit tests.",
)
def q22_field_cardinality(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    sql = field_cardinality_sql("events", ["event_type", "user_id"])
    return eng.query(sql).select("field_name", "total_count", "distinct_count")


@register(
    "q23_log_context",
    """
    SELECT * FROM (
        SELECT 'before' AS direction, event_id, ts, event_type
        FROM events
        WHERE ts < TIMESTAMP '2024-01-15 12:00:00'
        ORDER BY ts DESC, event_id DESC
        LIMIT 5
    )
    UNION ALL
    SELECT * FROM (
        SELECT 'after' AS direction, event_id, ts, event_type
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15 12:00:00'
        ORDER BY ts ASC, event_id ASC
        LIMIT 5
    )
    """,
    doc="Log-context window around an anchor (reference src/handlers/http/query_context.rs:118-286).",
)
def q23_log_context(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    sql = log_context_sql(
        "events",
        "ts",
        "event_id",
        "TIMESTAMP_NTZ '2024-01-15 12:00:00'",
        5,
        5,
        columns="event_id, ts, event_type",
    )
    return eng.query(sql)


@register(
    "q39_correlation",
    """
    SELECT e.event_id AS events_event_id,
           e.event_type AS events_event_type,
           e.value AS events_value,
           c.c_name AS customer_c_name,
           c.c_mktsegment AS customer_c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND e.ts < TIMESTAMP '2024-01-12 00:00:00'
    """,
    doc="Correlation: two streams joined on field equality with selected-field projection (reference src/correlation.rs:400-418).",
)
def q39_correlation(spark, sf_dir):
    from ..query.correlation import JoinCondition, TableConfig, correlate

    ev = load_table(spark, sf_dir, "events").filter(
        "ts >= TIMESTAMP_NTZ '2024-01-10 00:00:00' AND ts < TIMESTAMP_NTZ '2024-01-12 00:00:00'"
    )
    cust = load_table(spark, sf_dir, "customer")
    return correlate(
        ev,
        cust,
        TableConfig("events", ("event_id", "event_type", "value")),
        TableConfig("customer", ("c_name", "c_mktsegment")),
        (JoinCondition("events", "user_id"), JoinCondition("customer", "c_custkey")),
    )


@register(
    "q41_field_stats_pipeline",
    """
    WITH vc AS (
        SELECT 'event_type' AS field_name,
               coalesce(CAST(event_type AS VARCHAR), 'NULL') AS distinct_value,
               count(*) AS value_count
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'user_id', coalesce(CAST(user_id AS VARCHAR), 'NULL'), count(*)
        FROM events GROUP BY 2
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY field_name ORDER BY value_count DESC, distinct_value
        ) AS rn FROM vc
    ), totals AS (
        SELECT field_name, CAST(sum(value_count) AS BIGINT) AS count,
               CAST(count(*) AS BIGINT) AS distinct_count
        FROM vc GROUP BY 1
    )
    SELECT t.field_name, t.count, t.distinct_count,
           r.distinct_value, CAST(r.value_count AS BIGINT) AS value_count
    FROM totals t JOIN ranked r USING (field_name)
    WHERE r.rn <= 3
    """,
    doc="pstats write pipeline: single-pass stacked field stats (explode + one shuffle), exploded to scalar rows for the oracle (reference field_stats.rs:99-110).",
)
def q41_field_stats_pipeline(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..query.field_stats import compute_field_stats

    ev = load_table(spark, sf_dir, "events")
    stats = compute_field_stats(ev, "events", fields=["event_type", "user_id"], k=3)
    return stats.select(
        "field_name",
        "count",
        "distinct_count",
        F.explode("distinct_stats").alias("s"),
    ).select(
        "field_name",
        "count",
        "distinct_count",
        F.col("s.distinct_value").alias("distinct_value"),
        F.col("s.count").alias("value_count"),
    )


@register(
    "q46_latency_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.50), 3) AS p50,
           round(quantile_cont(value, 0.95), 3) AS p95,
           round(quantile_cont(value, 0.99), 3) AS p99,
           round(max(value), 3) AS p100
    FROM events
    GROUP BY event_type
    """,
    doc="Latency percentiles per group (APM stat panel): exact interpolated percentile; at scale swap percentile() for approx_percentile — same plan shape, sketch-based.",
)
def q46_latency_percentiles(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50)"), 3).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 3).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 3).alias("p99"),
        F.round(F.max("value"), 3).alias("p100"),
    )


@register(
    "q57_hll_sketch_rollup",
    None,
    doc=(
        "Mergeable HLL distinct-count rollup (datasketches): per-day "
        "hll_sketch_agg(user_id) partial sketches, hll_union_agg at query "
        "time — the pre-aggregated-cube pattern that answers COUNT(DISTINCT) "
        "over any day range at 100 TB without rescanning raw data. "
        "Approximate by construction → rows-only driver check; the ±5%% "
        "error bound vs the exact count is asserted in tests/test_sampling_"
        "sketches.py. Reference parity: distinct-count stat panels "
        "(src/storage/field_stats.rs distinct_stats)."
    ),
)
def q57_hll_sketch_rollup(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("bigint")
            .alias("approx_users")
        )
        .orderBy("event_type")
    )


@register(
    "q71_kll_quantile_rollup",
    None,
    doc=(
        "Mergeable KLL quantile rollup (datasketches): per-day "
        "kll_sketch_agg_double(value) partial sketches, "
        "kll_sketch_merge_double at query time, quantiles read off the "
        "merged sketch — the pre-aggregated-cube pattern that answers "
        "percentile panels over any day range at 100 TB without "
        "rescanning raw data (the percentile analog of q57's HLL "
        "rollup). Approximate by construction → rows-only driver check; "
        "the rank-error bound vs exact percentiles is asserted in "
        "tests/test_sampling_sketches.py."
    ),
)
def q71_kll_quantile_rollup(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    # kll_sketch_merge_double is a binary scalar; fold the per-day
    # partials (bounded: one per day per group) into one sketch
    merged = daily.groupBy("event_type").agg(
        F.collect_list("sk").alias("sks")
    ).select(
        "event_type",
        F.aggregate(
            F.slice(F.col("sks"), 2, F.greatest(F.size("sks") - 1, F.lit(0))),
            F.element_at(F.col("sks"), 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("sk"),
    )
    return merged.select(
        "event_type",
        *[
            F.round(
                F.kll_sketch_get_quantile_double("sk", F.lit(q)), 3
            ).alias(f"p{int(q * 100)}")
            for q in (0.50, 0.95, 0.99)
        ],
    ).orderBy("event_type")
