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
    "q04_counts_topk_nullsafe",
    f"""
    WITH grouped_counts AS (
        SELECT event_type AS grp, {duckdb_date_bin_sql('ts', 21600)} AS bin_epoch,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-22 00:00:00'
        GROUP BY grp, bin_epoch
    ), top_groups AS (
        SELECT grp FROM grouped_counts
        GROUP BY grp ORDER BY sum(cnt) DESC, grp NULLS LAST LIMIT 2
    )
    SELECT g.grp AS event_type, g.bin_epoch, g.cnt
    FROM grouped_counts g
    INNER JOIN top_groups t ON g.grp IS NOT DISTINCT FROM t.grp
    """,
    doc=(
        "Counts API with group_by: 3-CTE GROUP BY + top-K + null-safe "
        "(<=>) inner join back, generated SQL through the engine with "
        "time-filter injection (reference src/query/mod.rs:716-732). "
        "The k-row top_groups side broadcasts. (r2 names: q04 + q19.)"
    ),
)
def q04_counts_topk_nullsafe(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    sql = top_k_counts_sql("events", "ts", "event_type", 21600, 2)
    return eng.query(sql, "2024-01-08T00:00:00Z", "2024-01-22T00:00:00Z")


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
    "q19_sketch_rollups",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           round(quantile_cont(value, 0.50), 3) AS p50_exact,
           round(quantile_cont(value, 0.95), 3) AS p95_exact,
           round(quantile_cont(value, 0.99), 3) AS p99_exact,
           TRUE AS hll_ok,
           TRUE AS p50_ok,
           TRUE AS p95_ok,
           TRUE AS p99_ok
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "Mergeable sketch rollups (datasketches), HLL + KLL in one "
        "pre-aggregated cube: per-day hll_sketch_agg(user_id) and "
        "kll_sketch_agg_double(value) partials per event_type, merged at "
        "query time (hll_union_agg; kll_sketch_merge_double fold over the "
        "bounded per-day list) — answers COUNT(DISTINCT) and percentile "
        "panels over any day range at 100 TB without rescanning raw "
        "data. Hash-gated since r4: the result carries the EXACT "
        "COUNT(DISTINCT)/percentile companions as value columns, and the "
        "sketch estimates are folded into within-bound booleans the "
        "oracle pins to TRUE — hll_ok asserts the HLL(lgk=14) estimate "
        "is within ±5%% of exact (its a-priori RSE is ~0.8%%), and each "
        "pXX_ok asserts the KLL quantile lands between the exact "
        "quantiles at rank q±0.05 (KLL's a-priori rank error is ~1.7%%), "
        "so a sketch drifting out of bound flips the hash. The raw "
        "estimates stay ±-bound-asserted in "
        "tests/test_sampling_sketches.py. (r2 names: q57 + q71.)"
    ),
)
def q19_sketch_rollups(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", 14).alias("hll"),
        F.kll_sketch_agg_double("value").alias("kll"),
    )
    merged = (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("hll"))
            .cast("bigint")
            .alias("approx_users"),
            F.collect_list("kll").alias("sks"),
        )
        .select(
            "event_type",
            "approx_users",
            # kll_sketch_merge_double is a binary scalar; fold the
            # per-day partials (bounded: one per day per group)
            F.aggregate(
                F.slice(F.col("sks"), 2, F.greatest(F.size("sks") - 1, F.lit(0))),
                F.element_at(F.col("sks"), 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ).alias("sk"),
        )
    )
    approx = merged.select(
        "event_type",
        "approx_users",
        *[
            F.kll_sketch_get_quantile_double("sk", F.lit(q)).alias(f"approx_p{int(q * 100)}")
            for q in (0.50, 0.95, 0.99)
        ],
    )
    # Exact companions in one scan-grouped pass; the rank-band quantiles
    # (q±0.05) bound the KLL estimate in rank space, which is the space
    # KLL guarantees error in (value-space bands would be distribution-
    # dependent). Both sides are 1-row-per-event_type; the join broadcasts.
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users"),
        *[
            F.round(F.expr(f"percentile(value, {q})"), 3).alias(f"p{int(q * 100)}_exact")
            for q in (0.50, 0.95, 0.99)
        ],
        *[
            F.expr(f"percentile(value, {max(q - 0.05, 0.0)})").alias(f"lo{int(q * 100)}")
            for q in (0.50, 0.95, 0.99)
        ],
        *[
            F.expr(f"percentile(value, {min(q + 0.05, 1.0)})").alias(f"hi{int(q * 100)}")
            for q in (0.50, 0.95, 0.99)
        ],
    )
    joined = exact.join(F.broadcast(approx), "event_type")
    return joined.select(
        "event_type",
        "exact_users",
        "p50_exact",
        "p95_exact",
        "p99_exact",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("hll_ok"),
        *[
            F.col(f"approx_p{p}").between(F.col(f"lo{p}"), F.col(f"hi{p}")).alias(f"p{p}_ok")
            for p in (50, 95, 99)
        ],
    ).orderBy("event_type")


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
            ORDER BY cnt DESC, field_value ASC NULLS LAST LIMIT 5
        )
        UNION ALL
        SELECT * FROM (
            SELECT 'user_id' AS field_name, CAST(user_id AS VARCHAR) AS field_value,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 2
            ORDER BY cnt DESC, field_value ASC NULLS LAST LIMIT 5
        )
    ), card AS (
        SELECT 'event_type' AS field_name,
               CAST(count(*) AS BIGINT) AS total_count,
               CAST(count(DISTINCT coalesce(CAST(event_type AS VARCHAR), 'NULL'))
                    AS BIGINT) AS distinct_count
        FROM events
        UNION ALL
        SELECT 'user_id', CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT coalesce(CAST(user_id AS VARCHAR), 'NULL'))
                    AS BIGINT)
        FROM events
    )
    SELECT u.field_name, u.field_value, u.cnt,
           ROW_NUMBER() OVER (
               PARTITION BY u.field_name
               ORDER BY u.cnt DESC, u.field_value ASC NULLS LAST) AS rn,
           c.total_count, c.distinct_count
    FROM u JOIN card c ON u.field_name = c.field_name
    """,
    doc=(
        "Field-stats read side, complete: per-field top-K values "
        "(deterministic ORDER BY+LIMIT → TakeOrderedAndProject, rank over "
        "the <=k survivors) joined with per-field cardinality "
        "(total/distinct; Spark additionally computes approx_count_distinct "
        "— HLL++, replacing the reference's hand-rolled HLL, "
        "field_stats.rs:595+ — dropped from the oracle-checked columns). "
        "Reference src/storage/field_stats.rs:991-1100. "
        "Merges r2's q21 + q22; the per-field cardinality side is 2 rows "
        "→ broadcast join."
    ),
)
def q21_field_stats_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    topk = eng.query(field_top_k_sql("events", ["event_type", "user_id"], 5))
    card = eng.query(field_cardinality_sql("events", ["event_type", "user_id"])).select(
        "field_name", "total_count", "distinct_count"
    )
    return topk.join(F.broadcast(card), "field_name").select(
        "field_name", "field_value", "cnt", "rn", "total_count", "distinct_count"
    )


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
    from ..query.context import DIRECTION_TAG

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
    # the internal tag is dunder-named so it can't collide with user
    # columns (r6); the API-visible name stays `direction`
    return eng.query(sql).withColumnRenamed(DIRECTION_TAG, "direction")


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
    doc=(
        "Latency percentiles per group (APM stat panel): exact "
        "interpolated percentile; at scale swap percentile() for "
        "approx_percentile — same plan shape, sketch-based. Doubles as "
        "the driver-checked EXACT companion for q19's KLL quantile "
        "rollup (same grouping, same value column)."
    ),
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
