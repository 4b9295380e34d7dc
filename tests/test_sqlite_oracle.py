"""Third-party correctness vector (VERDICT r7 next-8 stretch).

The driver's oracle is DuckDB running SQL this repo's author also
wrote — a second implementation by the same author (the mirror-oracle
caveat carried since r3). This runner shrinks that caveat with an
INDEPENDENT engine: Python's stdlib sqlite3 executes the SAME
statements over the SAME sf0.001 tables, sqllogictest-style, and every
result set must match what `query/engine.py` (the product SQL path —
read-only gate, view registry, deadline machinery) returns.

Corpus: 100+ statements across projections, filters, aggregates,
GROUP BY/HAVING, inner/left joins, ORDER BY+LIMIT, CASE, string
functions, DISTINCT, subqueries, UNION, and date-literal ranges —
restricted to the dialect intersection (no bare int/int division, no
LIKE — sqlite's is case-insensitive —, no raw date columns in outputs,
deterministic ORDER BY keys).
"""

from __future__ import annotations

import math
import sqlite3

import pandas as pd
import pytest

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
SF_DIR = "/root/testdata/sf0.001"


def _statements() -> list[str]:
    s: list[str] = []
    # 1. row counts
    for t in TABLES:
        s.append(f"SELECT COUNT(*) AS n FROM {t}")
    # 2. numeric aggregate suites
    for t, c in [
        ("customer", "c_acctbal"), ("supplier", "s_acctbal"),
        ("part", "p_retailprice"), ("part", "p_size"),
        ("orders", "o_totalprice"), ("lineitem", "l_quantity"),
        ("lineitem", "l_extendedprice"), ("lineitem", "l_discount"),
        ("lineitem", "l_tax"), ("customer", "c_custkey"),
        ("orders", "o_orderkey"), ("lineitem", "l_linenumber"),
    ]:
        s.append(
            f"SELECT COUNT({c}) AS cnt, SUM({c}) AS s, AVG({c}) AS a, "
            f"MIN({c}) AS lo, MAX({c}) AS hi FROM {t}"
        )
    # 3. group-by
    for t, g, num in [
        ("nation", "n_regionkey", None),
        ("customer", "c_mktsegment", "c_acctbal"),
        ("customer", "c_nationkey", "c_acctbal"),
        ("supplier", "s_nationkey", "s_acctbal"),
        ("part", "p_brand", "p_retailprice"),
        ("orders", "o_orderstatus", "o_totalprice"),
        ("orders", "o_orderpriority", "o_totalprice"),
        ("lineitem", "l_returnflag", "l_quantity"),
        ("lineitem", "l_linestatus", "l_extendedprice"),
        ("part", "p_type", "p_size"),
    ]:
        agg = f", SUM({num}) AS s, AVG({num}) AS a" if num else ""
        s.append(f"SELECT {g} AS g, COUNT(*) AS c{agg} FROM {t} GROUP BY {g} ORDER BY {g}")
    # 4. filters
    for cond, t in [
        ("c_acctbal > 0", "customer"),
        ("c_acctbal BETWEEN -100 AND 3000", "customer"),
        ("c_mktsegment IN ('BUILDING', 'MACHINERY')", "customer"),
        ("c_nationkey = 3 OR c_nationkey = 7", "customer"),
        ("NOT (s_acctbal < 0)", "supplier"),
        ("p_size >= 25 AND p_size <= 40", "part"),
        ("p_brand <> 'Brand#13'", "part"),
        ("o_orderstatus = 'F'", "orders"),
        ("o_totalprice > 100000 OR o_orderpriority = '1-URGENT'", "orders"),
        ("l_discount >= 0.05 AND l_discount <= 0.07", "lineitem"),
        ("l_quantity < 10", "lineitem"),
        ("l_returnflag = 'R' AND l_linestatus = 'F'", "lineitem"),
    ]:
        s.append(f"SELECT COUNT(*) AS n FROM {t} WHERE {cond}")
    # 5. joins
    s += [
        "SELECT COUNT(*) AS n FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey",
        "SELECT r.r_name AS g, COUNT(*) AS c FROM customer c "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name ORDER BY r.r_name",
        "SELECT n.n_name AS g, COUNT(*) AS c, SUM(s.s_acctbal) AS s FROM supplier s "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name ORDER BY n.n_name",
        "SELECT c.c_mktsegment AS g, COUNT(*) AS c FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment",
        "SELECT COUNT(*) AS n, SUM(l.l_extendedprice) AS s FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderstatus = 'F'",
        "SELECT p.p_brand AS g, SUM(l.l_quantity) AS s FROM lineitem l "
        "JOIN part p ON l.l_partkey = p.p_partkey GROUP BY p.p_brand ORDER BY p.p_brand",
        "SELECT n.n_name AS g, COUNT(c.c_custkey) AS c FROM nation n "
        "LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name ORDER BY n.n_name",
        "SELECT COUNT(*) AS n FROM nation n LEFT JOIN region r "
        "ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'",
    ]
    # 6. order by + limit (deterministic tiebreak keys)
    s += [
        "SELECT c_custkey, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10",
        "SELECT c_custkey, c_acctbal FROM customer ORDER BY c_acctbal ASC, c_custkey LIMIT 10",
        "SELECT p_partkey, p_retailprice FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 12",
        "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15",
        "SELECT s_suppkey, s_acctbal FROM supplier ORDER BY s_acctbal DESC, s_suppkey LIMIT 5",
        "SELECT n_nationkey, n_name FROM nation ORDER BY n_name LIMIT 7",
    ]
    # 7. CASE + arithmetic
    s += [
        "SELECT SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS pos, "
        "SUM(CASE WHEN c_acctbal <= 0 THEN 1 ELSE 0 END) AS nonpos FROM customer",
        "SELECT AVG(c_acctbal * 2.5 + 1.0) AS a FROM customer",
        "SELECT SUM(l_extendedprice * (1.0 - l_discount)) AS rev FROM lineitem",
        "SELECT SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS charge FROM lineitem",
        "SELECT MIN(p_retailprice - p_size) AS lo, MAX(p_retailprice + p_size) AS hi FROM part",
        "SELECT o_orderstatus AS g, SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS big "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
        "SELECT SUM(CASE WHEN l_discount > 0.05 THEN l_quantity ELSE -l_quantity END) AS s FROM lineitem",
        "SELECT COUNT(*) AS n FROM part WHERE p_retailprice * 0.9 > 1500.0",
    ]
    # 8. string functions (dialect intersection; no LIKE — sqlite's is
    # case-insensitive, Spark's is not)
    s += [
        "SELECT r_name AS g, LENGTH(r_name) AS l FROM region ORDER BY r_name",
        "SELECT UPPER(c_mktsegment) AS g, COUNT(*) AS c FROM customer GROUP BY UPPER(c_mktsegment) ORDER BY g",
        "SELECT LOWER(n_name) AS g FROM nation ORDER BY g LIMIT 9",
        "SELECT SUBSTR(c_mktsegment, 1, 3) AS g, COUNT(*) AS c FROM customer "
        "GROUP BY SUBSTR(c_mktsegment, 1, 3) ORDER BY g",
        "SELECT r_name || '_x' AS g FROM region ORDER BY g",
        "SELECT COUNT(*) AS n FROM part WHERE INSTR(p_type, 'BRASS') > 0",
        "SELECT COUNT(*) AS n FROM part WHERE SUBSTR(p_brand, 1, 6) = 'Brand#'",
        "SELECT MIN(LENGTH(p_name)) AS lo, MAX(LENGTH(p_name)) AS hi FROM part",
    ]
    # 9. distinct
    for t, c in [
        ("customer", "c_mktsegment"), ("customer", "c_nationkey"),
        ("part", "p_brand"), ("orders", "o_orderpriority"),
        ("lineitem", "l_returnflag"), ("lineitem", "l_suppkey"),
    ]:
        s.append(f"SELECT COUNT(DISTINCT {c}) AS n FROM {t}")
    # 10. having
    s += [
        "SELECT c_nationkey AS g, COUNT(*) AS c FROM customer GROUP BY c_nationkey "
        "HAVING COUNT(*) > 2 ORDER BY c_nationkey",
        "SELECT p_brand AS g, COUNT(*) AS c FROM part GROUP BY p_brand "
        "HAVING COUNT(*) >= 3 ORDER BY p_brand",
        "SELECT l_suppkey AS g, SUM(l_quantity) AS s FROM lineitem GROUP BY l_suppkey "
        "HAVING SUM(l_quantity) > 200 ORDER BY l_suppkey",
        "SELECT o_custkey AS g, COUNT(*) AS c FROM orders GROUP BY o_custkey "
        "HAVING COUNT(*) >= 10 ORDER BY o_custkey",
    ]
    # 11. subqueries
    s += [
        "SELECT COUNT(*) AS n FROM customer WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)",
        "SELECT COUNT(*) AS n FROM supplier WHERE s_nationkey IN "
        "(SELECT n_nationkey FROM nation WHERE n_regionkey = 2)",
        "SELECT COUNT(*) AS n FROM part WHERE p_retailprice > "
        "(SELECT AVG(p_retailprice) FROM part) AND p_size < 30",
        "SELECT COUNT(*) AS n FROM orders o WHERE EXISTS "
        "(SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)",
        "SELECT COUNT(*) AS n FROM nation WHERE n_nationkey NOT IN "
        "(SELECT DISTINCT c_nationkey FROM customer)",
        "SELECT COUNT(*) AS n FROM customer c WHERE "
        "(SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) = 0",
    ]
    # 12. date-literal ranges (timestamps stay in WHERE, never in output)
    s += [
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderdate >= '1995-01-01'",
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderdate < '1994-06-01'",
        "SELECT COUNT(*) AS n FROM lineitem WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-07-01'",
        "SELECT SUM(o_totalprice) AS s FROM orders WHERE o_orderdate >= '1993-01-01' AND o_orderdate < '1994-01-01'",
        "SELECT l_returnflag AS g, COUNT(*) AS c FROM lineitem "
        "WHERE l_shipdate < '1995-01-01' GROUP BY l_returnflag ORDER BY l_returnflag",
    ]
    # 13. union
    s += [
        "SELECT n_regionkey AS k FROM nation UNION SELECT r_regionkey AS k FROM region ORDER BY 1",
        "SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey AS k FROM supplier ORDER BY 1",
        "SELECT 'c' AS src, COUNT(*) AS n FROM customer "
        "UNION ALL SELECT 's' AS src, COUNT(*) AS n FROM supplier ORDER BY src",
    ]
    # 14. numeric scalar functions + modulo (shared dialect)
    s += [
        "SELECT SUM(ABS(c_acctbal)) AS s FROM customer",
        "SELECT ROUND(AVG(o_totalprice), 2) AS a FROM orders",
        "SELECT p_size % 5 AS g, COUNT(*) AS c FROM part GROUP BY p_size % 5 ORDER BY g",
        "SELECT MIN(c_name) AS lo, MAX(c_name) AS hi FROM customer",
        "SELECT COUNT(*) AS n FROM lineitem WHERE l_orderkey % 7 = 0",
        "SELECT SUM(ROUND(l_discount * 100.0, 0)) AS s FROM lineitem",
    ]
    # 15. window functions (sqlite >= 3.25 has full support)
    s += [
        "SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn "
        "FROM customer ORDER BY rn LIMIT 10",
        "SELECT n_name AS g, RANK() OVER (ORDER BY n_regionkey, n_name) AS r FROM nation ORDER BY r",
        "SELECT o_orderkey, SUM(o_totalprice) OVER (PARTITION BY o_orderstatus) AS s "
        "FROM orders ORDER BY o_orderkey LIMIT 20",
        "SELECT s_suppkey, s_acctbal - AVG(s_acctbal) OVER (PARTITION BY s_nationkey) AS d "
        "FROM supplier ORDER BY s_suppkey LIMIT 15",
        "SELECT l_orderkey, l_linenumber, "
        "SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 25",
        "SELECT p_partkey, NTILE(4) OVER (ORDER BY p_retailprice, p_partkey) AS q "
        "FROM part ORDER BY p_partkey LIMIT 20",
        "SELECT o_orderkey, LAG(o_totalprice, 1) OVER (ORDER BY o_orderkey) AS prev "
        "FROM orders ORDER BY o_orderkey LIMIT 12",
        "SELECT c_nationkey AS g, COUNT(*) AS c, "
        "DENSE_RANK() OVER (ORDER BY COUNT(*) DESC, c_nationkey) AS r "
        "FROM customer GROUP BY c_nationkey ORDER BY r LIMIT 10",
    ]
    # 16. CTEs — incl. recursive (Spark 4 and sqlite both support)
    s += [
        "WITH big AS (SELECT * FROM orders WHERE o_totalprice > 150000) "
        "SELECT o_orderstatus AS g, COUNT(*) AS c FROM big GROUP BY o_orderstatus ORDER BY g",
        "WITH nat AS (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey <= 2) "
        "SELECT nat.n_name AS g, COUNT(c.c_custkey) AS c FROM nat "
        "LEFT JOIN customer c ON c.c_nationkey = nat.n_nationkey "
        "GROUP BY nat.n_name ORDER BY nat.n_name",
        "WITH a AS (SELECT AVG(c_acctbal) AS m FROM customer), "
        "b AS (SELECT AVG(s_acctbal) AS m FROM supplier) "
        "SELECT CASE WHEN a.m > b.m THEN 'cust' ELSE 'supp' END AS who FROM a, b",
        "WITH RECURSIVE seq(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 15) "
        "SELECT SUM(n) AS s, COUNT(*) AS c FROM seq",
        "WITH RECURSIVE seq(n) AS (SELECT 0 UNION ALL SELECT n + 5 FROM seq WHERE n < 45) "
        "SELECT n FROM seq ORDER BY n",
    ]
    # 17. null-producing scalar functions over non-null data
    s += [
        "SELECT COUNT(NULLIF(o_orderstatus, 'O')) AS n FROM orders",
        "SELECT COALESCE(NULLIF(MIN(r_name), ''), 'none') AS g FROM region",
        "SELECT COUNT(*) AS n FROM orders WHERE NULLIF(o_orderpriority, '5-LOW') IS NULL",
    ]
    # 18. set ops — INTERSECT / EXCEPT (both dialects: distinct set
    # semantics, no ALL variants in sqlite) (VERDICT r8 next-6)
    s += [
        "SELECT n_nationkey AS k FROM nation INTERSECT "
        "SELECT c_nationkey AS k FROM customer ORDER BY 1",
        "SELECT n_nationkey AS k FROM nation EXCEPT "
        "SELECT s_nationkey AS k FROM supplier ORDER BY 1",
        "SELECT c_nationkey AS k FROM customer INTERSECT "
        "SELECT s_nationkey AS k FROM supplier ORDER BY 1",
        "SELECT p_brand AS b FROM part WHERE p_size > 40 INTERSECT "
        "SELECT p_brand AS b FROM part WHERE p_retailprice > 1800 ORDER BY 1",
        "SELECT o_custkey AS k FROM orders EXCEPT "
        "SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0 ORDER BY 1 LIMIT 20",
        "SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 48 EXCEPT "
        "SELECT s_suppkey AS k FROM supplier WHERE s_acctbal < 0 ORDER BY 1 LIMIT 25",
    ]
    # 19. correlated EXISTS / NOT EXISTS / correlated scalar aggregates
    s += [
        "SELECT COUNT(*) AS n FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
        "SELECT COUNT(*) AS n FROM supplier s WHERE EXISTS "
        "(SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_discount > 0.09)",
        "SELECT COUNT(*) AS n FROM part p WHERE EXISTS "
        "(SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)",
        "SELECT COUNT(*) AS n FROM nation n WHERE EXISTS "
        "(SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey) "
        "AND EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)",
        "SELECT COUNT(*) AS n FROM orders o WHERE o.o_totalprice > "
        "(SELECT 2.0 * AVG(l.l_extendedprice) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)",
        "SELECT COUNT(*) AS n FROM customer c WHERE c.c_acctbal > "
        "(SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)",
    ]
    # 20. explicit NULL-ordering clauses (sqlite >= 3.30; nulls minted
    # via NULLIF so both engines order the same synthetic NULLs)
    s += [
        "SELECT NULLIF(o_orderstatus, 'O') AS g, COUNT(*) AS c FROM orders "
        "GROUP BY NULLIF(o_orderstatus, 'O') ORDER BY g NULLS FIRST",
        "SELECT NULLIF(o_orderstatus, 'F') AS g, COUNT(*) AS c FROM orders "
        "GROUP BY NULLIF(o_orderstatus, 'F') ORDER BY g NULLS LAST",
        "SELECT NULLIF(l_returnflag, 'N') AS g, SUM(l_quantity) AS s FROM lineitem "
        "GROUP BY NULLIF(l_returnflag, 'N') ORDER BY g DESC NULLS FIRST",
        "SELECT NULLIF(c_mktsegment, 'BUILDING') AS g, COUNT(*) AS c FROM customer "
        "GROUP BY NULLIF(c_mktsegment, 'BUILDING') ORDER BY g DESC NULLS LAST",
    ]
    s += _generated()
    return s


# -- seeded differential generator (VERDICT r8 next-6 stretch) -------------
# A deterministic random query generator over the PROVEN dialect
# intersection (every construct below already appears in the
# hand-written corpus): filters × aggregates × group-bys × dim joins ×
# HAVING × top-K. Seeded, so the corpus is pinned — a divergence is
# reproducible by statement index. Bump GEN_COUNT or the seed to fuzz
# further; keep outputs deterministic (aggregate-only or fully-keyed
# ORDER BY).
GEN_SEED = 0xC0FFEE
GEN_COUNT = 60

_NUM_COLS = {
    "customer": [("c_acctbal", -1000.0, 10000.0), ("c_custkey", 1, 1500)],
    "supplier": [("s_acctbal", -1000.0, 10000.0), ("s_suppkey", 1, 100)],
    "part": [("p_retailprice", 900.0, 2100.0), ("p_size", 1, 50)],
    "orders": [("o_totalprice", 1000.0, 400000.0), ("o_orderkey", 1, 60000)],
    "lineitem": [
        ("l_quantity", 1.0, 50.0),
        ("l_extendedprice", 900.0, 100000.0),
        ("l_discount", 0.0, 0.1),
    ],
}
_STR_COLS = {
    "customer": [("c_mktsegment", ["BUILDING", "MACHINERY", "AUTOMOBILE",
                                   "HOUSEHOLD", "FURNITURE"])],
    "orders": [("o_orderstatus", ["F", "O", "P"]),
               ("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM",
                                    "4-NOT SPECIFIED", "5-LOW"])],
    "lineitem": [("l_returnflag", ["A", "N", "R"]),
                 ("l_linestatus", ["F", "O"])],
    "part": [("p_brand", [f"Brand#{i}{j}" for i in range(1, 6)
                          for j in range(1, 6)])],
    "supplier": [],
}
_GROUP_COLS = {
    "customer": ["c_mktsegment", "c_nationkey"],
    "supplier": ["s_nationkey"],
    "part": ["p_brand", "p_size"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"],
}
_JOINS = {  # fact -> (dim, fact_key, dim_key, dim group col)
    "customer": ("nation", "c_nationkey", "n_nationkey", "n_name"),
    "supplier": ("nation", "s_nationkey", "n_nationkey", "n_name"),
    "orders": ("customer", "o_custkey", "c_custkey", "c_mktsegment"),
    "lineitem": ("part", "l_partkey", "p_partkey", "p_brand"),
}


def _gen_pred(rng, t: str, prefix: str = "") -> str:
    kind = rng.randrange(4)
    if kind == 0 and _STR_COLS[t]:
        col, vals = rng.choice(_STR_COLS[t])
        col = prefix + col
        if rng.random() < 0.5:
            picks = sorted(rng.sample(vals, k=min(len(vals), rng.randrange(1, 4))))
            quoted = ", ".join(f"'{v}'" for v in picks)
            return f"{col} IN ({quoted})"
        return f"{col} {rng.choice(['=', '<>'])} '{rng.choice(vals)}'"
    col, lo, hi = rng.choice(_NUM_COLS[t])
    col = prefix + col
    a = round(rng.uniform(lo, hi), 2)
    b = round(rng.uniform(lo, hi), 2)
    lo2, hi2 = min(a, b), max(a, b)
    kind2 = rng.randrange(3)
    if kind2 == 0:
        return f"{col} BETWEEN {lo2} AND {hi2}"
    if kind2 == 1:
        return f"{col} {rng.choice(['>', '>=', '<', '<='])} {a}"
    return f"NOT ({col} > {a})"


def _generated() -> list[str]:
    import random as _random

    rng = _random.Random(GEN_SEED)
    out: list[str] = []
    facts = sorted(_NUM_COLS)
    while len(out) < GEN_COUNT:
        t = rng.choice(facts)
        num, _, _ = rng.choice(_NUM_COLS[t])
        n_preds = rng.randrange(1, 3)
        preds = " AND ".join(_gen_pred(rng, t) for _ in range(n_preds))
        aggs = (
            f"COUNT(*) AS c, SUM({num}) AS s, AVG({num}) AS a, "
            f"MIN({num}) AS lo, MAX({num}) AS hi"
        )
        shape = rng.randrange(4)
        if shape == 2 and t not in _JOINS:
            shape = 0  # part has no dim table loaded here
        if shape == 0:  # plain filtered aggregate
            out.append(f"SELECT {aggs} FROM {t} WHERE {preds}")
        elif shape == 1:  # group-by (+ optional HAVING)
            g = rng.choice(_GROUP_COLS[t])
            having = (
                f" HAVING COUNT(*) >= {rng.randrange(2, 5)}"
                if rng.random() < 0.4
                else ""
            )
            out.append(
                f"SELECT {g} AS g, {aggs} FROM {t} WHERE {preds} "
                f"GROUP BY {g}{having} ORDER BY g"
            )
        elif shape == 2:  # dim join + group on the dim column
            dim, fk, dk, dg = _JOINS[t]
            jpreds = " AND ".join(
                _gen_pred(rng, t, prefix="f.") for _ in range(n_preds)
            )
            out.append(
                f"SELECT d.{dg} AS g, COUNT(*) AS c, SUM(f.{num}) AS s "
                f"FROM {t} f JOIN {dim} d ON f.{fk} = d.{dk} "
                f"WHERE {jpreds} "
                f"GROUP BY d.{dg} ORDER BY g"
            )
        else:  # top-K with full deterministic key
            key = {
                "customer": "c_custkey", "supplier": "s_suppkey",
                "part": "p_partkey", "orders": "o_orderkey",
                "lineitem": "l_orderkey, l_linenumber",
            }[t]
            out.append(
                f"SELECT {key}, {num} FROM {t} WHERE {preds} "
                f"ORDER BY {num} DESC, {key} LIMIT {rng.randrange(5, 21)}"
            )
    return out


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        return float(v)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _sort_key(row):
    return tuple(
        (0, "") if c is None
        else (1, round(c, 6)) if isinstance(c, float)
        else (1, float(c)) if isinstance(c, int)
        else (2, c)
        for c in row
    )


def _rows_equal(a, b) -> bool:
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for ca, cb in zip(ra, rb):
            if ca is None or cb is None:
                if ca is not cb:
                    return False
            elif isinstance(ca, (int, float)) and isinstance(cb, (int, float)):
                if not math.isclose(float(ca), float(cb), rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif ca != cb:
                return False
    return True


@pytest.fixture(scope="module")
def sqlite_db():
    con = sqlite3.connect(":memory:")
    for t in TABLES:
        pdf = pd.read_parquet(f"{SF_DIR}/{t}.parquet")
        for col in pdf.columns:
            if str(pdf[col].dtype).startswith("datetime"):
                pdf[col] = pdf[col].dt.strftime("%Y-%m-%d %H:%M:%S")
        pdf.to_sql(t, con, index=False)
    yield con
    con.close()


@pytest.fixture(scope="module")
def engine(spark):
    from parseable_spark.query.engine import QueryEngine

    eng = QueryEngine(spark)
    for t in TABLES:
        eng.register_stream(t, spark.read.parquet(f"{SF_DIR}/{t}.parquet"))
    yield eng
    for t in TABLES:
        eng.deregister_stream(t)


def test_sqlite_oracle_corpus(spark, sqlite_db, engine):
    stmts = _statements()
    assert len(stmts) >= 100, f"corpus has only {len(stmts)} statements"
    failures = []
    for i, sql in enumerate(stmts):
        spark_rows = [
            tuple(_norm_cell(c) for c in r) for r in engine.query(sql).collect()
        ]
        lite_rows = [
            tuple(_norm_cell(c) for c in r)
            for r in sqlite_db.execute(sql).fetchall()
        ]
        has_order = " ORDER BY " in sql.upper()
        if not has_order or " LIMIT " not in sql.upper():
            # unordered (or fully ordered without LIMIT): compare as
            # sorted multisets; LIMIT without ORDER BY is never emitted
            spark_rows = sorted(spark_rows, key=_sort_key)
            lite_rows = sorted(lite_rows, key=_sort_key)
        if not _rows_equal(spark_rows, lite_rows):
            failures.append(
                f"[{i}] {sql}\n  spark={spark_rows[:4]}\n  sqlite={lite_rows[:4]}"
            )
    assert not failures, (
        f"{len(failures)}/{len(stmts)} statements diverged:\n"
        + "\n".join(failures[:8])
    )
