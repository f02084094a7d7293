"""Classic TPC-H query shapes over the driver testdata.

The reference's five queries are TPC-DS-derived; these add the TPC-H
canon the same engine user would run — deeper join trees (up to six
tables), selective date/segment predicates, revenue expressions with
decimal discipline.  Registered as driver entries with DuckDB oracles.

Q3  — shipping-priority: 3-way join, revenue agg, 2-key TopN.
Q5  — local-supplier volume: 6-way join (customer⋈orders⋈lineitem⋈
      supplier⋈nation⋈region) with the c_nationkey = s_nationkey
      co-location predicate.
Q10 — returned-item reporting: 4-way join, group by customer attrs.

Dialect trap baked into these templates: a decimal CAST that reduces
scale ROUNDS (half-up) in Spark but TRUNCATES in DuckDB, so every
revenue aggregate rounds explicitly before the final cast.
"""

from __future__ import annotations

from dblab_ece_trino_spark.operators.registry import register_sql
from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))"
)

_Q3 = f"""
SELECT
  l.l_orderkey,
  CAST(round(sum({_REVENUE}), 2) AS DOUBLE) AS revenue,
  CAST(o.o_orderdate AS DATE) AS orderdate
FROM {{customer}} c, {{orders}} o, {{lineitem}} l
WHERE c.c_mktsegment = 'BUILDING'
  AND c.c_custkey = o.o_custkey
  AND l.l_orderkey = o.o_orderkey
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
ORDER BY revenue DESC, orderdate ASC, l_orderkey ASC
LIMIT 10
"""

_Q5 = f"""
SELECT
  n.n_name,
  CAST(round(sum({_REVENUE}), 2) AS DOUBLE) AS revenue
FROM {{customer}} c, {{orders}} o, {{lineitem}} l,
     {{supplier}} s, {{nation}} n, {{region}} r
WHERE c.c_custkey = o.o_custkey
  AND l.l_orderkey = o.o_orderkey
  AND l.l_suppkey = s.s_suppkey
  AND c.c_nationkey = s.s_nationkey
  AND s.s_nationkey = n.n_nationkey
  AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC
LIMIT 25
"""

_Q10 = f"""
SELECT
  c.c_custkey,
  c.c_name,
  CAST(round(sum({_REVENUE}), 2) AS DOUBLE) AS revenue,
  n.n_name
FROM {{customer}} c, {{orders}} o, {{lineitem}} l, {{nation}} n
WHERE c.c_custkey = o.o_custkey
  AND l.l_orderkey = o.o_orderkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
  AND c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

# exact interpolated percentiles — Spark percentile() and DuckDB
# quantile_cont() share the continuous-quantile definition
_PCT = """
SELECT
  l_returnflag,
  round({p50}, 4) AS p50_qty,
  round({p90}, 4) AS p90_qty
FROM {lineitem}
GROUP BY l_returnflag
"""

for _name, _sql in (("tpch_q3", _Q3), ("tpch_q5", _Q5), ("tpch_q10", _Q10)):
    register_sql(
        _name,
        _sql.format(**_SPARK_TABLES),
        _sql.format(**_ORACLE_TABLES),
    )

register_sql(
    "op_percentile",
    _PCT.format(
        p50="percentile(l_quantity, 0.5)",
        p90="percentile(l_quantity, 0.9)",
        **_SPARK_TABLES,
    ),
    _PCT.format(
        p50="quantile_cont(l_quantity, 0.5)",
        p90="quantile_cont(l_quantity, 0.9)",
        **_ORACLE_TABLES,
    ),
)
