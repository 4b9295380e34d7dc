"""Relational operator coverage (SURVEY.md §2.2).

The reference delegates every relational operator to DataFusion; we
delegate to Spark SQL / Catalyst. Each query here exercises one row of
the §2.2 inventory table over the driver's synthetic tables and is
hash-checked against a DuckDB oracle.

Determinism rules used throughout:
- float aggregates rounded (sum order varies across partitions);
- ORDER BY keys always made unique with an id tie-break;
- timestamps kept as TIMESTAMP_NTZ (µs) — matches DuckDB exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import date_bin, duckdb_date_bin_sql
from ..tables import load_table
from . import register

TS_FMT = "TIMESTAMP '2024-01-15 00:00:00'"


# --- projection / filter / hash aggregate (TPC-H Q1 shape) ----------------
@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                                   AS avg_qty,
           round(avg(l_extendedprice), 2)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Hash aggregate w/ partial+final (SURVEY §2.2 'Hash aggregate').",
)
def q01_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1999-12-01 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_filter_project",
    """
    SELECT event_id, user_id, round(value * 1.1, 3) AS adj_value
    FROM events
    WHERE event_type = 'error' AND value > 100
    """,
    doc="Projection + filter pushed to scan (SURVEY §2.2 row 1).",
)
def q02_filter_project(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 100))
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 1.1, 3).alias("adj_value"),
        )
    )


@register(
    "q03_string_predicates",
    """
    SELECT source,
           count(*) FILTER (WHERE text LIKE '%join%')        AS n_contains,
           count(*) FILTER (WHERE text NOT LIKE '%join%')    AS n_not_contains,
           count(*) FILTER (WHERE text LIKE 'the%')          AS n_begins,
           count(*) FILTER (WHERE text LIKE '%scan')         AS n_ends,
           count(*) FILTER (WHERE text ILIKE '%SPARK%')      AS n_ilike,
           count(*) FILTER (WHERE lang IS NOT NULL)          AS n_lang
    FROM documents
    GROUP BY source
    """,
    doc="LIKE/ILIKE contains/begins/ends + negation + IS NULL (alert predicate whitelist, reference src/alerts/alerts_utils.rs:426-520).",
)
def q03_string_predicates(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.groupBy("source").agg(
        F.count_if(t.contains("join")).alias("n_contains"),
        F.count_if(~t.contains("join")).alias("n_not_contains"),
        F.count_if(t.startswith("the")).alias("n_begins"),
        F.count_if(t.endswith("scan")).alias("n_ends"),
        F.count_if(t.ilike("%SPARK%")).alias("n_ilike"),
        F.count_if(F.col("lang").isNotNull()).alias("n_lang"),
    )


# --- counts API top-K with null-safe join (reference src/query/mod.rs:716-732)
@register(
    "q04_group_topk_nullsafe",
    f"""
    WITH grouped_counts AS (
        SELECT event_type, {duckdb_date_bin_sql('ts', 86400)} AS bin_epoch,
               count(*) AS cnt
        FROM events
        GROUP BY 1, 2
    ), top_groups AS (
        SELECT event_type FROM grouped_counts
        GROUP BY event_type ORDER BY sum(cnt) DESC, event_type LIMIT 3
    )
    SELECT g.event_type, g.bin_epoch, g.cnt
    FROM grouped_counts g
    INNER JOIN top_groups t ON g.event_type IS NOT DISTINCT FROM t.event_type
    """,
    doc="GROUP BY + top-K + null-safe inner join back (counts API).",
)
def q04_group_topk_nullsafe(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    grouped = (
        ev.groupBy("event_type", date_bin("ts", 86400).alias("bin_epoch"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = (
        grouped.groupBy("event_type")
        .agg(F.sum("cnt").alias("total"))
        .orderBy(F.desc("total"), F.asc("event_type"))
        .limit(3)
        .select("event_type")
    )
    # null-safe equality (<=>), small side broadcast — exactly what a
    # 1000-executor plan wants for a k-row dim.
    joined = grouped.alias("g").join(
        F.broadcast(top.alias("t")),
        F.col("g.event_type").eqNullSafe(F.col("t.event_type")),
        "inner",
    )
    return joined.select("g.event_type", "g.bin_epoch", "g.cnt")


@register(
    "q05_date_bin_histogram",
    f"""
    SELECT {duckdb_date_bin_sql('ts', 3600)} AS bin_epoch,
           count(*) AS cnt,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-17 00:00:00'
    GROUP BY 1
    """,
    doc="DATE_BIN histogram w/ epoch anchor (reference src/query/mod.rs:676-679).",
)
def q05_date_bin_histogram(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.expr("TIMESTAMP_NTZ '2024-01-10 00:00:00'"))
            & (F.col("ts") < F.expr("TIMESTAMP_NTZ '2024-01-17 00:00:00'"))
        )
        .groupBy(date_bin("ts", 3600).alias("bin_epoch"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@register(
    "q06_count_distinct",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(user_id)          AS n_events
    FROM events
    GROUP BY event_type
    """,
    doc="COUNT(DISTINCT) group aggregate (alert builder whitelist).",
)
def q06_count_distinct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("user_id").alias("n_events"),
    )


@register(
    "q07_window_rownum",
    """
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    doc="Ranking window (field-stats SQL shape, reference src/storage/field_stats.rs:1023-1033).",
)
def q07_window_rownum(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q08_window_countdistinct",
    """
    SELECT DISTINCT user_id,
           COUNT(DISTINCT event_type) OVER (PARTITION BY user_id) AS n_types
    FROM events
    """,
    doc="COUNT(DISTINCT) OVER — illegal in Spark; rewritten as size(collect_set() OVER) (SURVEY §2.2 'Window functions (analytic)', reference src/handlers/http/traces.rs:478-498).",
)
def q08_window_countdistinct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return (
        ev.select(
            "user_id",
            F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("n_types"),
        )
        .distinct()
    )


@register(
    "q09_sort_limit_offset",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    OFFSET 10 LIMIT 20
    """,
    doc="ORDER BY + OFFSET + LIMIT (trace list SQL, reference src/handlers/http/traces.rs:510-514).",
)
def q09_sort_limit_offset(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(20)
    )


@register(
    "q10_distinct",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    doc="SELECT DISTINCT (reference traces.rs:498).",
)
def q10_distinct(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "q11_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="Multi-join + agg + top-N (TPC-H Q3 shape; user SQL surface).",
)
def q11_shipping_priority(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # lineitem streams; the filtered customer⋈orders side is the build
    oc = (
        o.filter(F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '2000-03-15 00:00:00'"))
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
    )
    return (
        li.filter(F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ '1998-03-15 00:00:00'"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q12_local_supplier_volume",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="5-way join w/ broadcast dims (TPC-H Q5 shape); Catalyst picks broadcast-hash for region/nation/supplier.",
)
def q12_local_supplier_volume(spark, sf_dir):
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    # lineitem is the streaming/probe side everywhere: at 100 TB the
    # fact table must never be a hash-build side, and locally this
    # avoids materializing a 600k-row broadcast relation
    orders_cust = t["orders"].join(
        F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey")
    )
    return (
        t["lineitem"]
        .join(orders_cust, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q13_semi_anti_join",
    """
    SELECT 'no_orders' AS side, c_custkey AS key
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'has_big_order' AS side, c_custkey AS key
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    doc="LEFT ANTI + LEFT SEMI joins (engine capability row, SURVEY §2.2).",
)
def q13_semi_anti_join(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    anti = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select(F.lit("no_orders").alias("side"), F.col("c_custkey").alias("key"))
    )
    semi = (
        c.join(
            o.filter(F.col("o_totalprice") > 400000),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .select(F.lit("has_big_order").alias("side"), F.col("c_custkey").alias("key"))
    )
    return anti.unionAll(semi)


@register(
    "q14_set_ops",
    """
    SELECT 'both' AS tag, n_nationkey AS key FROM (
        SELECT c_nationkey AS n_nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'customer_only' AS tag, n_nationkey AS key FROM (
        SELECT c_nationkey AS n_nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier
    )
    """,
    doc="UNION ALL / INTERSECT / EXCEPT (SURVEY §2.2 'Set ops').",
)
def q14_set_ops(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("key"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("key"))
    both = c.intersect(s).select(F.lit("both").alias("tag"), "key")
    conly = c.subtract(s).select(F.lit("customer_only").alias("tag"), "key")
    return both.unionAll(conly)


@register(
    "q15_subqueries",
    """
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) * 1.04 FROM part)
      AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.5)
    """,
    doc="Scalar subquery + NOT IN subquery (reference traces.rs:612).",
)
def q15_subqueries(spark, sf_dir):
    # expressed through Spark SQL to exercise the subquery planner
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_retailprice
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) * 1.04 FROM part)
          AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.5)
        """
    )


@register(
    "q16_case_coalesce_cast",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CASE WHEN value >= 150 THEN 'high'
                WHEN value >= 50  THEN 'mid'
                ELSE 'low' END AS tier,
           COALESCE(NULLIF(event_type, 'view'), 'hidden') AS etype,
           CAST(user_id AS STRING) AS user_str
    FROM events
    WHERE event_id < 500
    """,
    doc="CAST/CASE/COALESCE/NULLIF + JSON extraction (scalar fn surface).",
)
def q16_case_coalesce_cast(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 500).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.when(F.col("value") >= 150, "high")
        .when(F.col("value") >= 50, "mid")
        .otherwise("low")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("view")), F.lit("hidden")).alias(
            "etype"
        ),
        F.col("user_id").cast("string").alias("user_str"),
    )


@register(
    "q17_multi_dim_histogram",
    """
    SELECT date_trunc('day', ts) AS day, event_type,
           count(*) AS cnt,
           round(min(value), 2) AS min_v,
           round(max(value), 2) AS max_v,
           round(avg(value), 6) AS avg_v
    FROM events
    GROUP BY 1, 2
    """,
    doc="date_trunc histogram x group dims (counts API w/ conditions).",
)
def q17_multi_dim_histogram(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.min("value"), 2).alias("min_v"),
        F.round(F.max("value"), 2).alias("max_v"),
        F.round(F.avg("value"), 6).alias("avg_v"),
    )


@register(
    "q43_json_extraction",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(count(CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) > 50
                           THEN 1 END) AS BIGINT) AS n_high,
           CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS n_distinct_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON scalar functions over a raw JSON column (get_json_object — the SQL-surface json fns row, SURVEY §2.2); extraction stays JVM-side.",
)
def q43_json_extraction(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.count(F.when(k > 50, 1)).alias("n_high"),
        F.countDistinct(k).alias("n_distinct_k"),
    )


@register(
    "q44_outer_joins",
    """
    SELECT n.n_name,
           CAST(count(c.c_custkey) AS BIGINT) AS n_customers,
           CAST(count(CASE WHEN c.c_acctbal > 5000 THEN 1 END) AS BIGINT) AS n_rich
    FROM nation n
    LEFT OUTER JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="LEFT OUTER join preserving unmatched dimension rows (user-SQL join surface, SURVEY §2.2 'Joins').",
)
def q44_outer_joins(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return (
        n.join(c, F.col("c_nationkey") == F.col("n_nationkey"), "left_outer")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.count(F.when(F.col("c_acctbal") > 5000, 1)).alias("n_rich"),
        )
    )


@register(
    "q45_theta_join",
    """
    SELECT l.l_orderkey,
           CAST(count(*) AS BIGINT) AS n_late_lines,
           round(sum(l.l_extendedprice), 2) AS late_value
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
                 AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_orderkey
    ORDER BY late_value DESC, l.l_orderkey
    LIMIT 25
    """,
    doc="Theta join: equi key + non-equi time residual (ship > order+90d) — Catalyst keeps the hash join on the equi key and applies the range predicate as a residual filter.",
)
def q45_theta_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    joined = li.join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
    )
    return (
        joined.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_late_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("late_value"),
        )
        .orderBy(F.desc("late_value"), F.asc("l_orderkey"))
        .limit(25)
    )


@register(
    "q47_rolling_zscore",
    """
    WITH w AS (
        SELECT event_id, event_type, value,
               avg(value) OVER win AS mu,
               stddev_samp(value) OVER win AS sigma,
               count(*) OVER win AS n
        FROM events
        WINDOW win AS (
            PARTITION BY event_type ORDER BY ts, event_id
            ROWS BETWEEN 100 PRECEDING AND CURRENT ROW
        )
    )
    SELECT event_id, event_type,
           round((value - mu) / sigma, 3) AS zscore
    FROM w
    WHERE n > 30 AND sigma > 0 AND abs((value - mu) / sigma) > 2.5
    """,
    doc="Rolling z-score anomaly detection: bounded window frame (ROWS BETWEEN) per group — the window-frame row of SURVEY §2.2; streams as one pass per partition, state bounded by the frame.",
)
def q47_rolling_zscore(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-100, 0)
    )
    w = ev.select(
        "event_id",
        "event_type",
        "value",
        F.avg("value").over(win).alias("mu"),
        F.stddev_samp("value").over(win).alias("sigma"),
        F.count(F.lit(1)).over(win).alias("n"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        w.filter((F.col("n") > 30) & (F.col("sigma") > 0) & (F.abs(z) > 2.5))
        .select("event_id", "event_type", F.round(z, 3).alias("zscore"))
    )


@register(
    "q48_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy aggregate (subtotals + grand total in one pass) — multi-level aggregation from the user-SQL surface; partial aggregation applies per grouping set.",
)
def q48_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "q52_asof_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id, p.ts,
           p.value AS purchase_value,
           c.value AS click_value, c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
        SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'click'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ) c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc=(
        "As-of (point-in-time) join: latest click at-or-before each purchase "
        "per user. Spark lacks ASOF JOIN; implemented as union+window "
        "(one key shuffle, no range-join blowup) in functions/asof.py. "
        "Oracle is DuckDB's native ASOF LEFT JOIN with a deterministic "
        "tie-break dedupe."
    ),
)
def q52_asof_join(spark, sf_dir):
    from ..functions import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        F.col("value").alias("purchase_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("value").alias("click_value"),
        F.col("event_id").alias("click_id"),
    )
    return asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_value", "click_id"],
        right_order=["click_id"],
        matched_ts_col="click_ts",
    )


@register(
    "q53_range_join",
    """
    SELECT e.event_id, e.user_id, CAST(count(*) AS BIGINT) AS n_nearby_clicks
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    JOIN (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id
     AND c.click_ts BETWEEN e.ts - INTERVAL 300 SECOND
                        AND e.ts + INTERVAL 300 SECOND
    GROUP BY e.event_id, e.user_id
    """,
    doc=(
        "Time-range (interval) join: clicks within ±5 min of each error, "
        "same user. Bucketed equi-join + residual filter "
        "(functions/rangejoin.py) — hash shuffle on (user_id, bucket), "
        "never a nested-loop cartesian. Oracle is the plain inequality "
        "join DuckDB can afford at this scale."
    ),
)
def q53_range_join(spark, sf_dir):
    from ..functions.rangejoin import time_range_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    pairs = time_range_join(
        errors,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        lower_seconds=-300,
        upper_seconds=300,
    )
    return pairs.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_nearby_clicks")
    )


@register(
    "q59_grouping_sets",
    """
    SELECT event_type,
           CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
           CAST(grouping(event_type) AS INT) AS g_type,
           CAST(grouping(CAST(date_trunc('day', ts) AS DATE)) AS INT) AS g_day,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY GROUPING SETS (
        (event_type, CAST(date_trunc('day', ts) AS DATE)),
        (event_type),
        (CAST(date_trunc('day', ts) AS DATE)),
        ()
    )
    """,
    doc=(
        "GROUPING SETS: per (type, day), per type, per day, and grand total "
        "in one logical pass, with grouping() flags disambiguating real "
        "NULLs from subtotal rows. Catalyst expands sets before the hash "
        "aggregate, so partial (map-side) aggregation still applies to every "
        "set — one shuffle, not four queries. Completes the multi-level "
        "aggregation family next to q48's ROLLUP."
    ),
)
def q59_grouping_sets(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    return (
        ev.select("event_type", day.cast("string").alias("day"), "value")
        .groupingSets(
            [["event_type", "day"], ["event_type"], ["day"], []],
            "event_type",
            "day",
        )
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("day").cast("int").alias("g_day"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select("event_type", "day", "g_type", "g_day", "n", "total")
    )


@register(
    "q60_time_range_frame",
    """
    SELECT event_id, event_type, ts,
           round(sum(value) OVER (
               PARTITION BY event_type ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 2) AS rolling_sum_1h,
           CAST(count(*) OVER (
               PARTITION BY event_type ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_events_1h
    FROM events
    """,
    doc=(
        "Time-based window frame (RANGE BETWEEN INTERVAL): per-type rolling "
        "1 h sum and count over event time — the value-based frame "
        "variant next to q47's ROWS BETWEEN. One shuffle on the partition "
        "key; the frame is evaluated by a sliding aggregate over the sorted "
        "run, not a self-join."
    ),
)
def q60_time_range_frame(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_q60_events")
    return spark.sql(
        """
        SELECT event_id, event_type, ts,
               round(sum(value) OVER (
                   PARTITION BY event_type ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ), 2) AS rolling_sum_1h,
               CAST(count(*) OVER (
                   PARTITION BY event_type ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_events_1h
        FROM _q60_events
        """
    )


@register(
    "q68_sessionization",
    """
    WITH o AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT *, sum(new_s) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM o
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
    doc=(
        "Gap-based sessionization (30 min inactivity): lag → new-session "
        "flag → running sum per user → one hash aggregate. Every window "
        "PARTITIONed by user_id — per-user work in one task, users "
        "parallelize; one shuffle at 100 TB."
    ),
)
def q68_sessionization(spark, sf_dir):
    from ..functions.sessions import sessionize

    return sessionize(load_table(spark, sf_dir, "events"), gap_seconds=1800)


@register(
    "q69_funnel",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(ts) AS t1 FROM events e JOIN v USING (user_id)
        WHERE event_type = 'click' AND ts > t0 GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(ts) AS t2 FROM events e JOIN c USING (user_id)
        WHERE event_type = 'purchase' AND ts > t1 GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS step_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS step_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS step_purchase
    """,
    doc=(
        "Ordered-funnel conversion (view → click → purchase): step k "
        "counts users whose first step-k event is strictly after their "
        "first qualifying step-(k-1) event. Per-step per-user aggregates "
        "chained with left joins on the entity key, ONE final aggregate "
        "job — no per-step driver actions, no cross-user windows."
    ),
)
def q69_funnel(spark, sf_dir):
    from ..functions.sessions import funnel

    return funnel(
        load_table(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )
