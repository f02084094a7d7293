"""Extended TPC-H canon: Q1/Q4/Q6/Q12/Q14/Q18/Q19 shapes over the driver
testdata.

Together with queries_tpch.py (Q3/Q5/Q10) this covers the classic
single-source TPC-H surface a reference user would expect from the engine:
wide multi-aggregate scans (Q1), EXISTS / IN decorrelated subqueries
(Q4/Q18), selective conjunctive filter-sums (Q6), case-sum pivots over a
join (Q12), join + conditional aggregate (Q14), and disjunctive
multi-column OR predicates (Q19).

Adaptations to the driver schema (TESTDATA.md): lineitem has no
shipmode/commitdate/receiptdate, so Q12 groups by l_linestatus and
Q4's EXISTS predicate uses l_returnflag = 'R'; part's p_type is a plain
category ('PROMO', ...) so Q14/Q19 use equality instead of LIKE.

Reference parity notes: these generalize the operator surface already
evidenced in the reference's plans — conjunctive/disjunctive predicates
(queries/q005.sql:4-6), CASE projections (queries/q004.sql:9-13),
partial→final aggregation (results/q002/workers-1/analyze.txt:10-28),
decorrelated subqueries (the q005 EXCEPT decorrelation,
results/q005/workers-1/explain.txt:25-112).

Every aggregate is computed in DECIMAL and rounded before the final
downscale cast so the DuckDB comparison is exact under any partitioning
(Spark rounds scale-reducing decimal casts, DuckDB truncates — the
dialect trap documented in queries_tpch.py).
"""

from __future__ import annotations

from dblab_ece_trino_spark.operators.registry import register_sql
from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

_ONE = "CAST(1 AS DECIMAL(12,4))"
_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
_DISC = "CAST(l_discount AS DECIMAL(12,4))"
_TAX = "CAST(l_tax AS DECIMAL(12,4))"
_QTY = "CAST(l_quantity AS DECIMAL(12,2))"

_Q1 = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(round(sum({_QTY}), 2) AS DOUBLE) AS sum_qty,
  CAST(round(sum({_PRICE}), 2) AS DOUBLE) AS sum_base_price,
  CAST(round(sum({_PRICE} * ({_ONE} - {_DISC})), 2) AS DOUBLE) AS sum_disc_price,
  CAST(round(sum({_PRICE} * ({_ONE} - {_DISC}) * ({_ONE} + {_TAX})), 2)
       AS DOUBLE) AS sum_charge,
  count(*) AS count_order
FROM {{lineitem}}
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM {orders} o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM {lineitem} l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_Q6 = f"""
SELECT CAST(round(sum({_PRICE} * {_DISC}), 2) AS DOUBLE) AS revenue
FROM {{lineitem}}
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""

_Q12 = """
SELECT
  l.l_linestatus AS shipgroup,
  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM {orders} o
JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
ORDER BY shipgroup
"""

_REV = f"{_PRICE} * ({_ONE} - {_DISC})"

_Q14 = f"""
SELECT
  CAST(round(sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV}
                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2)
       AS DOUBLE) AS promo_revenue,
  CAST(round(sum({_REV}), 2) AS DOUBLE) AS total_revenue
FROM {{lineitem}} l
JOIN {{part}} p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""

_Q18 = f"""
SELECT
  c.c_name,
  o.o_orderkey,
  CAST(o.o_orderdate AS DATE) AS orderdate,
  CAST(round(sum({_QTY}), 2) AS DOUBLE) AS total_qty
FROM {{customer}} c, {{orders}} o, {{lineitem}} l
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM {{lineitem}}
    GROUP BY l_orderkey
    HAVING sum({_QTY}) > 150)
  AND c.c_custkey = o.o_custkey
  AND o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE)
ORDER BY total_qty DESC, o.o_orderkey
LIMIT 100
"""

_Q19 = f"""
SELECT CAST(round(sum({_REV}), 2) AS DOUBLE) AS revenue
FROM {{lineitem}} l
JOIN {{part}} p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 40)
   OR (p.p_type = 'PROMO' AND l.l_quantity >= 20)
"""

for _name, _tpl in (
    ("tpch_q1", _Q1),
    ("tpch_q4", _Q4),
    ("tpch_q6", _Q6),
    ("tpch_q12", _Q12),
    ("tpch_q14", _Q14),
    ("tpch_q18", _Q18),
    ("tpch_q19", _Q19),
):
    register_sql(
        _name,
        _tpl.format(**_SPARK_TABLES),
        _tpl.format(**_ORACLE_TABLES),
    )
