"""Trace-API queries, oracle-checked.

Spans are derived deterministically from the events table (span id =
event id, parent = id div 3 → a tree ~8 levels deep, one trace), so the
iterative-BFS hierarchy (Spark has no WITH RECURSIVE) can be checked
against DuckDB executing the reference's actual recursive-CTE shape
(traces.rs:563-624).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import epoch_seconds
from ..query import traces
from ..tables import load_table
from . import register

_DEPTH = 12

_DUCK_SPANS = """
    SELECT CAST(event_id AS VARCHAR) AS span_span_id,
           CASE WHEN event_id = 0 THEN '' ELSE CAST(event_id // 3 AS VARCHAR) END AS span_parent_span_id,
           'svc-' || CAST(user_id % 5 AS VARCHAR) AS service_name,
           event_type AS span_name,
           value * 1000000.0 AS span_duration_ns,
           CAST(floor(epoch(ts)) AS BIGINT) AS span_start_time_unix_nano_epoch,
           'T0' AS span_trace_id,
           CASE WHEN value > 180 THEN 2 ELSE 0 END AS span_status_code
    FROM events WHERE event_id < 3000
"""


def _spark_spans(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    return ev.select(
        F.col("event_id").cast("string").alias("span_span_id"),
        F.when(F.col("event_id") == 0, F.lit(""))
        .otherwise(F.expr("CAST(event_id div 3 AS STRING)"))
        .alias("span_parent_span_id"),
        F.concat(F.lit("svc-"), (F.col("user_id") % 5).cast("string")).alias(
            "service_name"
        ),
        F.col("event_type").alias("span_name"),
        (F.col("value") * 1000000.0).alias("span_duration_ns"),
        epoch_seconds("ts").alias("span_start_time_unix_nano_epoch"),
        F.lit("T0").alias("span_trace_id"),
        F.when(F.col("value") > 180, 2).otherwise(0).alias("span_status_code"),
    )


@register(
    "q36_trace_hierarchy",
    f"""
    WITH RECURSIVE spans AS ({_DUCK_SPANS}),
    deduped AS (
        SELECT span_span_id, span_parent_span_id, service_name, span_name,
               span_duration_ns, span_start_time_unix_nano_epoch, span_trace_id,
               CAST(MAX(CASE WHEN span_status_code = 2 THEN 1 ELSE 0 END) AS BOOLEAN) AS has_error
        FROM spans GROUP BY 1,2,3,4,5,6,7
    ),
    all_ids AS (SELECT DISTINCT span_span_id FROM deduped),
    span_hierarchy AS (
        SELECT span_span_id, 0 AS level FROM deduped
        WHERE COALESCE(span_parent_span_id, '') = ''
           OR span_parent_span_id NOT IN (SELECT span_span_id FROM all_ids)
        UNION ALL
        SELECT s.span_span_id, sh.level + 1
        FROM deduped s INNER JOIN span_hierarchy sh
          ON s.span_parent_span_id = sh.span_span_id
        WHERE sh.level < {_DEPTH}
    ),
    span_levels AS (
        SELECT span_span_id, MIN(level) AS level FROM span_hierarchy GROUP BY 1
    )
    SELECT d.span_span_id, d.span_parent_span_id, d.service_name, d.span_name,
           d.span_duration_ns, d.span_start_time_unix_nano_epoch, d.span_trace_id,
           d.has_error, sl.level,
           CAST(COUNT(*) OVER () AS BIGINT) AS total_span_count
    FROM deduped d INNER JOIN span_levels sl ON d.span_span_id = sl.span_span_id
    """,
    doc="Recursive span hierarchy: Spark-side bounded iterative BFS vs DuckDB executing the reference's WITH RECURSIVE (traces.rs:563-624) — SURVEY §2.2 'Recursive CTE'.",
)
def q36_trace_hierarchy(spark, sf_dir):
    return traces.trace_detail(_spark_spans(spark, sf_dir), "T0", max_depth=_DEPTH)


@register(
    "q37_trace_list_bounds",
    f"""
    WITH spans AS (
        SELECT CAST(event_id AS VARCHAR) AS span_span_id,
               '' AS span_parent_span_id,
               'svc-' || CAST(user_id % 5 AS VARCHAR) AS service_name,
               event_type AS span_name,
               value * 1000000.0 AS span_duration_ns,
               CAST(floor(epoch(ts)) AS BIGINT) AS span_start_time_unix_nano_epoch,
               'T' || CAST(event_id % 40 AS VARCHAR) AS span_trace_id,
               CASE WHEN value > 180 THEN 2 ELSE 0 END AS span_status_code
        FROM events
    ),
    trace_stats AS (
        SELECT service_name, span_name, span_duration_ns, span_trace_id,
               span_span_id, span_start_time_unix_nano_epoch,
               COUNT(DISTINCT span_span_id) OVER (PARTITION BY span_trace_id) AS total_span_count,
               COUNT(DISTINCT CASE WHEN span_status_code = 2 THEN span_span_id END)
                   OVER (PARTITION BY span_trace_id) AS error_count
        FROM spans
    ),
    bounds AS (
        SELECT CAST(count(DISTINCT CASE WHEN span_status_code = 2 THEN span_span_id END) AS BIGINT) AS error_spans,
               CAST(count(DISTINCT span_span_id) AS BIGINT) AS total_spans,
               min(span_start_time_unix_nano_epoch) AS start_epoch,
               max(span_start_time_unix_nano_epoch) AS end_epoch
        FROM spans
    )
    SELECT * FROM (
        SELECT DISTINCT service_name, span_name, span_duration_ns, span_trace_id,
               span_span_id, span_start_time_unix_nano_epoch, total_span_count, error_count
        FROM trace_stats
        ORDER BY span_start_time_unix_nano_epoch DESC, span_span_id ASC
        OFFSET 5 LIMIT 20
    ) CROSS JOIN bounds
    """,
    doc=(
        "Trace list w/ COUNT(DISTINCT) OVER rewritten as grouped distinct "
        "counts + broadcast join-back (traces.rs:464-514), plus the trace "
        "count/bounds aggregates (traces.rs:517-544) cross-joined on as "
        "constant columns — the one-call trace-console payload. The "
        "bounds side is a 1-row aggregate → broadcast. "
        "(r2 names: q37 + q38.)"
    ),
)
def q37_trace_list_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    spans = ev.select(
        F.col("event_id").cast("string").alias("span_span_id"),
        F.lit("").alias("span_parent_span_id"),
        F.concat(F.lit("svc-"), (F.col("user_id") % 5).cast("string")).alias(
            "service_name"
        ),
        F.col("event_type").alias("span_name"),
        (F.col("value") * 1000000.0).alias("span_duration_ns"),
        epoch_seconds("ts").alias("span_start_time_unix_nano_epoch"),
        F.concat(F.lit("T"), (F.col("event_id") % 40).cast("string")).alias(
            "span_trace_id"
        ),
        F.when(F.col("value") > 180, 2).otherwise(0).alias("span_status_code"),
    )
    listed = traces.trace_list(spans, offset=5, limit=20)
    bounds = spans.agg(
        F.countDistinct(
            F.when(F.col("span_status_code") == 2, F.col("span_span_id"))
        ).alias("error_spans"),
        F.countDistinct("span_span_id").alias("total_spans"),
        F.min("span_start_time_unix_nano_epoch").alias("start_epoch"),
        F.max("span_start_time_unix_nano_epoch").alias("end_epoch"),
    )
    return listed.crossJoin(F.broadcast(bounds))
