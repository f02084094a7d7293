"""Correlated-subquery TPC-H shapes and array/lateral operators.

Completes the decorrelation surface the reference's plans evidence:
q005's EXCEPT is decorrelated into marker aggregation
(results/q005/workers-1/explain.txt:25-112) — the same Catalyst machinery
(RewriteCorrelatedScalarSubquery, RewritePredicateSubquery) handles the
classic TPC-H correlated shapes registered here:

- tpch_q17: correlated scalar aggregate subqueries in a filter
  (per-part quantity threshold).
- tpch_q21: EXISTS + NOT EXISTS against the same fact table
  (multi-supplier order analysis).
- tpch_q22: uncorrelated scalar subqueries + NOT EXISTS anti join.

Numeric discipline: no engine-side division or floating aggregate ever
reaches a comparison or an output column.  Thresholds of the form
``x < 0.2 * avg(y)`` are algebraically cleared to
``x * 5 * count(y) < sum(y)`` over DECIMAL — exact in Spark and DuckDB
under any partitioning (the avg/division forms are not: DuckDB's ``/``
and ``avg`` are float, Spark's are decimal-HALF_UP).

Array surface (beyond-parity, needed by the embedding pipeline):
- op_explode: posexplode of a vector column (DuckDB: unnest +
  generate_subscripts, 1-based, aligned by +1 on the Spark side).
- op_array_hof: size / filter / transform higher-order functions with
  integer-exact outputs (float lambda arithmetic is engine-specific;
  counts are not).
"""

from __future__ import annotations

from dblab_ece_trino_spark.operators.registry import register_sql
from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

_QTY = "CAST(l_quantity AS DECIMAL(12,2))"
_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
_BAL = "CAST(c_acctbal AS DECIMAL(18,2))"

# Q17 shape: small-quantity outliers per brand.  The classic form filters
# l_quantity < 0.2 * avg(l_quantity per part); cleared of division:
# qty * 5 * count_part < sum_part.
_Q17 = f"""
SELECT
  CAST(round(sum({_PRICE}), 2) AS DOUBLE) AS total_price,
  count(*) AS n_lines
FROM {{lineitem}} l
JOIN {{part}} p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND {_QTY} * 5 * (SELECT count(*) FROM {{lineitem}} l2
                    WHERE l2.l_partkey = l.l_partkey)
      < (SELECT sum(CAST(l3.l_quantity AS DECIMAL(12,2))) FROM {{lineitem}} l3
         WHERE l3.l_partkey = l.l_partkey)
"""

# Q21 shape: suppliers whose returned line is the ONLY returned line on a
# multi-supplier finished order — EXISTS and NOT EXISTS on the same fact.
_Q21 = """
SELECT s.s_name, count(*) AS numwait
FROM {supplier} s
JOIN {lineitem} l1 ON s.s_suppkey = l1.l_suppkey
JOIN {orders} o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM {lineitem} l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM {lineitem} l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""

# Q22 shape: well-funded customers with no orders.  avg threshold cleared
# of division: bal * count_pos > sum_pos.
_Q22 = f"""
SELECT
  c.c_mktsegment AS segment,
  count(*) AS numcust,
  CAST(round(sum({_BAL}), 2) AS DOUBLE) AS totacctbal
FROM {{customer}} c
WHERE {_BAL} * (SELECT count(*) FROM {{customer}} c2 WHERE c2.c_acctbal > 0.0)
      > (SELECT sum(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM {{customer}} c3
         WHERE c3.c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM {{orders}} o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
ORDER BY segment
"""

# Q21 rewritten for scale: the EXISTS + NOT EXISTS pair over the same
# fact is algebraically one per-order aggregation — EXISTS(other
# supplier) ⟺ the order has ≥2 distinct suppliers, and NOT EXISTS(other
# returned supplier) ⟺ exactly 1 distinct returned supplier (l1 itself is
# returned, so it is always counted).  Distinct counts are computed as a
# two-level aggregation (group by (order, supp), then by order) rather
# than count(DISTINCT ...): Spark plans count-distinct via an Expand that
# doubles the fact, and measured at x30 the expand form (30.6s) loses to
# even the EXISTS joins (27.0s) while the two-level form wins at 10.1s —
# one fact pass instead of three.  Registered alongside tpch_q21 so the
# correctness gate pins the equivalence.
_Q21_AGG = """
SELECT s.s_name, count(*) AS numwait
FROM {supplier} s
JOIN {lineitem} l1 ON s.s_suppkey = l1.l_suppkey
JOIN {orders} o ON o.o_orderkey = l1.l_orderkey
JOIN (
  SELECT l_orderkey,
         count(*) AS n_supp,
         sum(CASE WHEN has_ret THEN 1 ELSE 0 END) AS n_ret_supp
  FROM (
    SELECT l_orderkey, l_suppkey,
           max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1 AS has_ret
    FROM {lineitem}
    GROUP BY l_orderkey, l_suppkey
  )
  GROUP BY l_orderkey
) agg ON agg.l_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND agg.n_supp >= 2
  AND agg.n_ret_supp = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""

# Q7 shape: volume between nation pairs — the same dimension joined twice
# under two aliases (supplier's nation × customer's nation), a 6-way join
# with a disjunctive pair filter and a year-grouped decimal aggregate.
_Q7 = f"""
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  year(l.l_shipdate) AS l_year,
  CAST(round(sum({_PRICE} * (CAST(1 AS DECIMAL(12,4))
                             - CAST(l_discount AS DECIMAL(12,4)))), 2)
       AS DOUBLE) AS revenue
FROM {{supplier}} s
JOIN {{lineitem}} l ON s.s_suppkey = l.l_suppkey
JOIN {{orders}} o ON o.o_orderkey = l.l_orderkey
JOIN {{customer}} c ON c.c_custkey = o.o_custkey
JOIN {{nation}} n1 ON s.s_nationkey = n1.n_nationkey
JOIN {{nation}} n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
    OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""

for _name, _tpl in (
    ("tpch_q17", _Q17),
    ("tpch_q21", _Q21),
    ("tpch_q22", _Q22),
    ("tpch_q7", _Q7),
    ("tpch_q21_agg", _Q21_AGG),
):
    register_sql(_name, _tpl.format(**_SPARK_TABLES), _tpl.format(**_ORACLE_TABLES))

# ---------------------------------------------------------------- array ops

# Lateral explode of the embedding vector.  Spark's posexplode is 0-based,
# DuckDB's generate_subscripts is 1-based; align on 1-based `pos`.
_EXPLODE_SPARK = """
SELECT vec_id, pos + 1 AS pos, CAST(val AS DOUBLE) AS val
FROM {embeddings}
LATERAL VIEW posexplode(embedding) AS pos, val
WHERE vec_id < 40
""".format(**_SPARK_TABLES)

_EXPLODE_ORACLE = """
SELECT vec_id,
       generate_subscripts(embedding, 1) AS pos,
       CAST(unnest(embedding) AS DOUBLE) AS val
FROM {embeddings}
WHERE vec_id < 40
""".format(**_ORACLE_TABLES)

register_sql("op_explode", _EXPLODE_SPARK, _EXPLODE_ORACLE)

# Higher-order functions over the vector column; outputs are integer-exact
# (element counts), so the comparison is partition- and engine-stable.
_HOF_SPARK = """
SELECT vec_id,
       size(embedding) AS dim,
       size(filter(embedding, x -> x > 0)) AS n_pos,
       size(filter(transform(embedding, x -> x * x), x -> x > 0.01)) AS n_large
FROM {embeddings}
WHERE vec_id < 200
""".format(**_SPARK_TABLES)

_HOF_ORACLE = """
SELECT vec_id,
       len(embedding) AS dim,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       len(list_filter(list_transform(embedding, x -> x * x), x -> x > 0.01)) AS n_large
FROM {embeddings}
WHERE vec_id < 200
""".format(**_ORACLE_TABLES)

register_sql("op_array_hof", _HOF_SPARK, _HOF_ORACLE)
