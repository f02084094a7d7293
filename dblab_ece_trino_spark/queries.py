"""The reference benchmark query set, re-expressed over the driver testdata.

The reference ships five federated TPC-DS-derived queries
(/root/reference/queries/q001.sql..q005.sql) run over three stores.  The
driver's testdata is TPC-H-ish (TESTDATA.md), so each query here keeps the
*shape* — operators, join structure, aggregation, semantic traps — while
swapping in the analog tables (FIXTURES.md mapping: lineitem/orders ≈
facts, customer/nation/supplier ≈ dims, events ≈ the third channel):

- q001 (queries/q001.sql): global sum over a surrogate-key range filter on
  the "psql" fact.  Exercises agg pushdown / partial-final agg + parquet
  predicate pushdown.
- q002 (queries/q002.sql): same shape over the "mongodb" fact.
- q003 (queries/q003.sql): fact ⋈ dim equi-join (broadcast expected),
  group-by with count, ORDER BY count DESC LIMIT 20 (TopN).
- q004 (queries/q004.sql): composite-key LEFT JOIN + inner join that
  silently drops unmatched-left rows (the semantic trap, SURVEY §7.5),
  CASE WHEN ... IS NOT NULL, group-by sum, 2-key deterministic TopN.
- q005 (queries/q005.sql): three channels' DISTINCT (name, date) pairs,
  chained EXCEPT (distinct), global count.  EXCEPT keys include a date cast
  and a 12-month window filter (the d_month_seq analog).

Every numeric aggregate is computed in DECIMAL, never double, so the
DuckDB oracle comparison is exact regardless of partitioning / summation
order (the reference's workers-1 vs workers-5 result-stability property,
SURVEY §5).  The FINAL projection of every decimal output casts to
DOUBLE: the driver renders the DuckDB oracle through pandas, which
coerces DECIMAL to float64 — a trailing-zero Decimal on the Spark side
would hash differently even though the values are equal (the round-1 W1
lesson).  The cast is exact: values carry ≤4 decimal digits and both
engines convert exact decimals to the nearest double identically.

Each query is a template over table tokens; ``spark_sql`` renders it with
3-part catalog names (through the engine's rewrite path) and ``oracle_sql``
with plain view names for DuckDB.
"""

from __future__ import annotations

from dataclasses import dataclass

# Spark-side rendering uses the reference-style federated placement
# (catalog.py REFERENCE_PLACEMENT); the oracle uses DuckDB's plain views.
_SPARK_TABLES = {
    "lineitem": "psql.tpch.lineitem",
    "orders": "mongodb.tpch.orders",
    "customer": "psql.tpch.customer",
    "supplier": "psql.tpch.supplier",
    "nation": "psql.tpch.nation",
    "region": "psql.tpch.region",
    "part": "psql.tpch.part",
    "events": "elastic.default.events",
    "documents": "lake.llm.documents",
    "embeddings": "lake.llm.embeddings",
}
_ORACLE_TABLES = {k: k for k in _SPARK_TABLES}


@dataclass(frozen=True)
class QueryTemplate:
    name: str
    template: str
    description: str = ""

    def spark_sql(self) -> str:
        return self.template.format(**_SPARK_TABLES)

    def oracle_sql(self) -> str:
        return self.template.format(**_ORACLE_TABLES)


Q001 = QueryTemplate(
    "q001",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
    FROM {lineitem}
    WHERE l_orderkey BETWEEN 1000 AND 9000
    """,
    "global sum + BETWEEN range filter on the psql fact (q001.sql)",
)

Q002 = QueryTemplate(
    "q002",
    """
    SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
    FROM {orders}
    WHERE o_orderkey BETWEEN 1000 AND 9000
    """,
    "global sum + BETWEEN range filter on the mongodb fact (q002.sql)",
)

Q003 = QueryTemplate(
    "q003",
    """
    SELECT c.c_mktsegment AS segment, count(*) AS orders
    FROM {orders} o
    JOIN {customer} c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey BETWEEN 1000 AND 9000
    GROUP BY c.c_mktsegment
    ORDER BY orders DESC
    LIMIT 20
    """,
    "fact ⋈ dim join + group-by count + TopN DESC (q003.sql)",
)

# q004: composite-key LEFT JOIN against a derived "returns" table
# (lineitem rows with l_returnflag='R'; return qty = qty - linenumber,
# reason key nullable), then an inner join to the "reason" dim (supplier)
# which silently drops rows whose left join found no return — preserving
# the reference's exact semantics (queries/q004.sql:15-19, SURVEY §7.5).
Q004 = QueryTemplate(
    "q004",
    """
    SELECT ss_customer_sk, CAST(CAST(sum(act_sales) AS DECIMAL(18,2)) AS DOUBLE) AS sumsales
    FROM (
      SELECT
        ss.l_suppkey AS ss_customer_sk,
        CASE
          WHEN sr.sr_return_quantity IS NOT NULL
            THEN (CAST(ss.l_quantity AS DECIMAL(12,2)) - sr.sr_return_quantity)
                 * CAST(ss.l_extendedprice AS DECIMAL(18,2))
          ELSE CAST(ss.l_quantity AS DECIMAL(12,2))
               * CAST(ss.l_extendedprice AS DECIMAL(18,2))
        END AS act_sales
      FROM {lineitem} ss
      LEFT JOIN (
        SELECT
          l_orderkey AS sr_orderkey,
          l_linenumber AS sr_linenumber,
          CASE WHEN l_partkey % 7 = 0 THEN NULL ELSE l_suppkey END AS sr_reason_sk,
          CAST(l_quantity AS DECIMAL(12,2)) - CAST(l_linenumber AS DECIMAL(12,2))
            AS sr_return_quantity
        FROM {lineitem}
        WHERE l_returnflag = 'R'
      ) sr
        ON sr.sr_orderkey = ss.l_orderkey
       AND sr.sr_linenumber = ss.l_linenumber
      JOIN {supplier} r ON sr.sr_reason_sk = r.s_suppkey
    ) t
    GROUP BY ss_customer_sk
    ORDER BY sumsales, ss_customer_sk
    LIMIT 100
    """,
    "composite-key left join + reason join + CASE + group sum + 2-key TopN (q004.sql)",
)

# q005: three "channels" — psql fact (lineitem ship dates), mongodb fact
# (orders order dates), elastic fact (events timestamps) — each producing
# DISTINCT (customer name, activity date) inside a 12-month window, chained
# EXCEPT, global count (queries/q005.sql).  The events channel's dates lie
# outside the window's era, so the second EXCEPT removes zero rows — an
# intentional edge (EXCEPT against a disjoint set must be a no-op).
Q005 = QueryTemplate(
    "q005",
    """
    SELECT count(*) AS cool_cust_count
    FROM (
      (SELECT DISTINCT c.c_name, CAST(l.l_shipdate AS DATE) AS d_date
       FROM {lineitem} l, {orders} o, {customer} c
       WHERE l.l_orderkey = o.o_orderkey
         AND o.o_custkey = c.c_custkey
         AND CAST(l.l_shipdate AS DATE)
             BETWEEN DATE '1996-01-01' AND DATE '1996-12-31')
      EXCEPT
      (SELECT DISTINCT c.c_name, CAST(o.o_orderdate AS DATE) AS d_date
       FROM {orders} o, {customer} c
       WHERE o.o_custkey = c.c_custkey
         AND CAST(o.o_orderdate AS DATE)
             BETWEEN DATE '1996-01-01' AND DATE '1996-12-31')
      EXCEPT
      (SELECT DISTINCT c.c_name, CAST(e.ts AS DATE) AS d_date
       FROM {events} e, {customer} c
       WHERE e.user_id = c.c_custkey
         AND CAST(e.ts AS DATE)
             BETWEEN DATE '1996-01-01' AND DATE '1996-12-31')
    ) cool_cust
    """,
    "3-channel DISTINCT + chained EXCEPT + count (q005.sql)",
)

REFERENCE_QUERIES: dict[str, QueryTemplate] = {
    q.name: q for q in (Q001, Q002, Q003, Q004, Q005)
}
