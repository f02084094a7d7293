"""Relational operator inventory (SURVEY §2.1-2.8), one focused query each.

Shapes and semantics mirror what the reference's five queries + captured
plans exercise (cites per entry); tables are the driver testdata analogs.
All aggregates over double columns are computed in DECIMAL so oracle
comparisons are exact under any partitioning (reference's workers-1 vs
workers-5 invariance, SURVEY §5).

Output-type discipline (driver hash parity): the driver renders the
DuckDB oracle through pandas, which coerces DECIMAL and HUGEINT to
float64 — so a Spark `Decimal('1234.50')` hashes differently from the
oracle's `1234.5` even when values are equal.  Therefore every registered
output column is a "render-stable" type: strings, BIGINT (oracle
`sum(int)` explicitly CAST to BIGINT — DuckDB's HUGEINT otherwise goes
float), DOUBLE (decimal aggregates keep DECIMAL internally and CAST the
final projection to DOUBLE — exact, values carry ≤4 decimal digits),
DATE, TIMESTAMP, BOOLEAN.  Never a bare DECIMAL, never a nullable
numeric that only one side renders as NaN.

Beyond strict parity, the set-op/join/agg surface Spark shares with ANSI
SQL (semi/anti joins, INTERSECT, UNION ALL, ROLLUP, window functions) is
registered too — the reference engine (Trino) supports all of these even
though its five queries don't use them, so a reference user switching over
gets them here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dblab_ece_trino_spark.operators.registry import register, register_sql


def _both(name: str, template: str, oracle: bool = True, doc: str = "") -> None:
    """Register one SQL template rendered for Spark (3-part) and DuckDB."""
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    register_sql(
        name,
        template.format(**_SPARK_TABLES),
        template.format(**_ORACLE_TABLES) if oracle else None,
    )


# --------------------------------------------------------------- §2.2 scans,
# projections, filters, CASE (reference q004 explain.txt:50-53, q005:25)
_both(
    "op_project_case",
    """
    SELECT
      l_orderkey,
      l_linenumber,
      CASE WHEN l_discount > 0.05 THEN 'discounted' ELSE 'full' END AS price_class,
      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
    FROM {lineitem}
    WHERE l_orderkey BETWEEN 100 AND 500
    """,
)

_both(
    "op_filter_conjunction",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM {lineitem}
    WHERE l_orderkey BETWEEN 0 AND 5000
      AND l_returnflag = 'R'
      AND l_shipdate IS NOT NULL
      AND l_quantity >= 10
    """,
)

# ----------------------------------------------------------------- §2.3 joins
# Broadcast hash inner join (q003 explain.txt:49-62, REPLICATED build side):
# built via the DataFrame API with an explicit broadcast hint.
def _op_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for

    cat = engine_for(spark, sf_dir).catalogs
    customer = cat.table("psql.tpch.customer")
    nation = cat.table("psql.tpch.nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


register(
    "op_join_broadcast",
    _op_join_broadcast,
    oracle="""
    SELECT n_name,
           count(*) AS customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)

# Partitioned (shuffle) hash join of two facts (q004 explain.txt:54-65).
_both(
    "op_join_shuffle",
    """
    SELECT o.o_orderstatus, count(*) AS line_count,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM {lineitem} l
    JOIN {orders} o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)

# Left outer join on a composite 2-column key (queries/q004.sql:15-17).
_both(
    "op_join_left_composite",
    """
    SELECT
      CASE WHEN sr.sr_orderkey IS NULL THEN 'unmatched' ELSE 'matched' END AS side,
      count(*) AS n
    FROM {lineitem} ss
    LEFT JOIN (
      SELECT l_orderkey AS sr_orderkey, l_linenumber AS sr_linenumber
      FROM {lineitem} WHERE l_returnflag = 'R'
    ) sr
      ON sr.sr_orderkey = ss.l_orderkey AND sr.sr_linenumber = ss.l_linenumber
    GROUP BY 1
    """,
)

# Semi / anti joins — Trino-supported surface beyond the five queries
# (SURVEY §2.3 "not present"); expressed as EXISTS so the same text runs
# on DuckDB while Catalyst plans LeftSemi/LeftAnti.
_both(
    "op_join_semi",
    """
    SELECT count(*) AS customers_with_orders
    FROM {customer} c
    WHERE EXISTS (SELECT 1 FROM {orders} o WHERE o.o_custkey = c.c_custkey)
    """,
)

_both(
    "op_join_anti",
    """
    SELECT count(*) AS customers_without_orders
    FROM {customer} c
    WHERE NOT EXISTS (SELECT 1 FROM {orders} o WHERE o.o_custkey = c.c_custkey)
    """,
)

# ---------------------------------------------------------------- §2.4 aggs
# Global partial→final aggregation, no keys (q002 analyze.txt:10-28).
_both(
    "op_agg_global",
    """
    SELECT
      count(*) AS n_rows,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(CAST(min(l_extendedprice) AS DECIMAL(18,2)) AS DOUBLE) AS min_price,
      CAST(CAST(max(l_extendedprice) AS DECIMAL(18,2)) AS DOUBLE) AS max_price
    FROM {lineitem}
    """,
)

# Hash group-by with multiple aggregates — the TPC-H Q1 "pricing summary"
# shape, superset of q003's count-per-key (q003 explain.txt:33-48).
_both(
    "op_agg_groupby",
    """
    SELECT
      l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      count(*) AS count_order
    FROM {lineitem}
    GROUP BY l_returnflag, l_linestatus
    """,
)

# DISTINCT → keyed aggregate (q005 explain.txt:57-59).
_both(
    "op_distinct",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM {lineitem}
    """,
)

# ROLLUP — Trino surface beyond the five queries (SURVEY §2.4 note).
_both(
    "op_agg_rollup",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM {lineitem}
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)

# ------------------------------------------------------------ §2.6 TopN
# ORDER BY ... LIMIT as a bounded heap with deterministic tiebreak
# (q003 explain.txt:9 TopN; q004 2-key order).
def _op_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for

    cat = engine_for(spark, sf_dir).catalogs
    orders = cat.table("mongodb.tpch.orders")
    return (
        orders.select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("o_totalprice"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


register(
    "op_topn",
    _op_topn,
    oracle="""
    SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
)

# --------------------------------------------------------------- §2.7 set ops
# EXCEPT (distinct) — the q005 core (queries/q005.sql:7,13); Catalyst
# rewrites to a left-anti join (ReplaceExceptWithAntiJoin).
_both(
    "op_except",
    """
    SELECT count(*) AS n FROM (
      (SELECT DISTINCT o_custkey FROM {orders} WHERE o_orderstatus = 'O')
      EXCEPT
      (SELECT DISTINCT o_custkey FROM {orders} WHERE o_orderstatus = 'F')
    ) t
    """,
)

_both(
    "op_intersect",
    """
    SELECT count(*) AS n FROM (
      (SELECT DISTINCT o_custkey FROM {orders} WHERE o_orderstatus = 'O')
      INTERSECT
      (SELECT DISTINCT o_custkey FROM {orders} WHERE o_orderstatus = 'F')
    ) t
    """,
)

_both(
    "op_union",
    """
    SELECT o_custkey, count(*) AS n FROM (
      SELECT o_custkey FROM {orders} WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT o_custkey FROM {orders} WHERE o_orderstatus = 'F'
    ) t
    GROUP BY o_custkey
    """,
)

# ------------------------------------------------------- §2.8 scalar functions
# Arithmetic with decimal widening, CAST, comparisons (q004 explain.txt:53).
_both(
    "op_scalar_arithmetic",
    """
    SELECT
      l_orderkey,
      l_linenumber,
      CAST( CAST( (CAST(l_quantity AS DECIMAL(12,2)) - CAST(l_linenumber AS DECIMAL(12,2)))
            * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(24,4) ) AS DOUBLE ) AS adjusted,
      CAST(l_orderkey AS VARCHAR(20)) AS key_str,
      l_orderkey % 16 AS key_mod
    FROM {lineitem}
    WHERE l_orderkey BETWEEN 0 AND 1000
    """,
)

# Window function — Trino surface beyond the five queries (SURVEY §2.5).
_both(
    "op_window_rownum",
    """
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM {orders}
    ) t
    WHERE rn <= 3
    """,
)

# Tumbling time-window aggregation over the events table via date_trunc —
# batch analog of the streaming rollup (see streaming/ for the
# Structured-Streaming form).
_both(
    "op_events_time_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM {events}
    GROUP BY 1, 2
    """,
)

# Session windows over the event table — the built-in session_window in
# batch mode (streaming form: streaming/events.session_window_counts).
# Oracle: the classic gaps-and-islands rewrite (lag → island id → group),
# with >= on the gap to mirror session_window's exclusive end boundary.
def _op_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.streaming.events import session_window_counts

    cat = engine_for(spark, sf_dir).catalogs
    out = session_window_counts(cat.table("elastic.default.events"))
    # final projection to DOUBLE for driver render parity (decimal agg
    # stays inside the operator — see module docstring)
    return out.withColumn("total_value", F.col("total_value").cast("double"))


_SESSION_ORACLE = """
WITH m AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events),
g AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM m)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM g
GROUP BY user_id, sess
"""

register("op_session_window", _op_session_window, _SESSION_ORACLE)


# Batch twin of the CUSTOM stateful sessionizer (streaming form:
# streaming/events.sessionize via applyInPandasWithState) — same Arrow
# accumulator seam through applyInPandas, session_end = last event ts
# (vs session_window's last + gap).  Gives the custom-stateful
# streaming surface a driver-visible graded row; the oracle is the
# gaps-and-islands rewrite with the same >= gap split.
def _op_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.streaming.events import sessionize_batch

    cat = engine_for(spark, sf_dir).catalogs
    return sessionize_batch(cat.table("elastic.default.events"))


_SESSIONIZE_BATCH_ORACLE = """
WITH m AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events),
g AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM m)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM g
GROUP BY user_id, sess
"""

register("op_sessionize_batch", _op_sessionize_batch, _SESSIONIZE_BATCH_ORACLE)


# Stream-stream interval join, batch analog (streaming form:
# streaming/events.attribute_clicks — same code path; batch/stream
# equality is pinned in tests/test_streaming.py).
def _op_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.streaming.events import attribute_clicks

    cat = engine_for(spark, sf_dir).catalogs
    return attribute_clicks(cat.table("elastic.default.events"))


register(
    "op_click_attribution",
    _op_click_attribution,
    """
    SELECT v.event_id AS view_id,
           c.event_id AS click_id,
           v.user_id,
           v.ts AS view_ts,
           c.ts AS click_ts,
           c.value
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 4 HOUR
    """,
)


# The reference's deterministic hash-bucketing idiom
# (loader.py:213-218: mod(bitwise_and(from_big_endian_64(xxhash64(to_utf8(
# cast(k as varchar)))), 2^63-1), N)) — in Spark one call: pmod(xxhash64).
# Bucket *values* are engine-specific, but the partitioning invariants are
# oracle-checkable: buckets form a complete disjoint cover of the input
# (sum of per-bucket counts == table count), every bucket id lies in
# [0, N), and at 1500 rows / 8 buckets every bucket is hit (the
# probability of an empty bucket is 8·(7/8)^1500 ≈ 10^-86).  Exact hash
# properties (determinism, distribution) stay property-tested in pytest.
def _op_hash_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.functions.hashing import bucket_expr

    cat = engine_for(spark, sf_dir).catalogs
    orders = cat.table("mongodb.tpch.orders")
    per_bucket = (
        orders.withColumn("bucket", bucket_expr(F.col("o_orderkey"), 8))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    return per_bucket.agg(
        F.sum("n").alias("total_rows"),
        F.count("*").cast("long").alias("n_buckets"),
        F.min("bucket").cast("long").alias("min_bucket"),
        F.max("bucket").cast("long").alias("max_bucket"),
    )


register(
    "op_hash_bucketing",
    _op_hash_bucketing,
    oracle="""
    SELECT count(*) AS total_rows,
           CAST(8 AS BIGINT) AS n_buckets,
           CAST(0 AS BIGINT) AS min_bucket,
           CAST(7 AS BIGINT) AS max_bucket
    FROM orders
    """,
)


# Two-phase salted aggregation (operators/aggregates.py): the skew-safe
# groupBy — shuffle on (key, salt) spreads a hot key over n_salts
# reducers, then a tiny second shuffle recombines partials.  Exactly
# equal to the direct groupBy for algebraic aggregates, which is what
# the oracle pins (sums in DECIMAL, final projection DOUBLE).
def _op_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.operators.aggregates import salted_agg

    li = engine_for(spark, sf_dir).catalogs.table("psql.tpch.lineitem")
    prepared = li.select(
        "l_suppkey", F.col("l_quantity").cast("decimal(12,2)").alias("qty")
    )
    out = salted_agg(
        prepared, keys=["l_suppkey"], sums={"qty": "sum_qty"}, count_alias="n_lines"
    )
    return out.withColumn("sum_qty", F.col("sum_qty").cast("double"))


register(
    "op_salted_agg",
    _op_salted_agg,
    oracle="""
    SELECT l_suppkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n_lines
    FROM lineitem
    GROUP BY l_suppkey
    """,
)


# ----------------------------------------------------- extended SQL surface
# Beyond the reference's five queries, the full Trino-grade relational
# surface a switching user expects: multi-dim aggregation, window
# functions, string/date/conditional scalars, approximate distinct.

_both(
    "op_agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM {lineitem}
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)

_both(
    "op_agg_cube",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM {lineitem}
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)

_both(
    "op_window_rank_lag",
    """
    SELECT o_custkey, o_orderkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           lag(o_orderkey) OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order
    FROM {orders}
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)

# Distribution/navigation window functions (ntile, percent_rank,
# cume_dist, first/last_value) — deterministic because the ORDER BY key
# (o_orderkey) is unique within each partition.
_both(
    "op_window_distribution",
    """
    SELECT o_custkey, o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM {orders}
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)

_both(
    "op_window_running_sum",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_qty
    FROM {lineitem}
    WHERE l_orderkey < 500
    """,
)

_both(
    "op_string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           substr(c_name, 1, 8) AS prefix,
           concat(c_name, '-', c_mktsegment) AS joined,
           replace(c_name, '#', '_') AS replaced,
           length(c_name) AS name_len,
           trim(c_name) AS trimmed,
           CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one
    FROM {customer}
    WHERE c_custkey < 200
    """,
)

_both(
    "op_date_functions",
    """
    SELECT o_orderkey,
           extract(year FROM o_orderdate) AS yr,
           extract(month FROM o_orderdate) AS mo,
           extract(day FROM o_orderdate) AS dy,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
    FROM {orders}
    WHERE o_orderkey < 500
    """,
)

_both(
    "op_conditional_functions",
    """
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_label,
           greatest(o_orderkey, o_custkey) AS g,
           least(o_orderkey, o_custkey) AS l
    FROM {orders}
    WHERE o_orderkey < 500
    """,
)


# approx_count_distinct: the raw sketch estimate is engine-specific
# (HLL++ here), but the entry's *contract* — estimate within the
# documented 5% relative error of the exact count — is oracle-checkable:
# emit the exact count plus a within-tolerance boolean, and let the
# oracle pin (exact, true).  Tighter sketch-accuracy properties stay in
# pytest.
def _op_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for

    li = engine_for(spark, sf_dir).catalogs.table("psql.tpch.lineitem")
    # rsd=0.01 sizes the HLL++ sketch so the estimate sits comfortably
    # inside the 5% contract the oracle pins (default rsd=0.05 means the
    # typical error itself is ~5% — a coin flip against the band).
    approx = F.approx_count_distinct("l_orderkey", rsd=0.01)
    exact = F.count_distinct("l_orderkey")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_orders"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("within_5pct"),
    )


register(
    "op_approx_distinct",
    _op_approx_distinct,
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS exact_orders,
           true AS within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)


# JSON extraction — the ES-analog path stores JSON documents (reference
# loader.py:237 builds them); both engines expose path extraction
# (dialects differ, so the oracle is written in DuckDB's).
register_sql(
    "op_json_extract",
    """
    SELECT event_type,
           sum(CAST(get_json_object(props, '$.k') AS INT)) AS sum_k,
           count(*) AS n
    FROM elastic.default.events
    GROUP BY event_type
    """,
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)


# PIVOT — DataFrame API pivot vs a manual CASE aggregation oracle.
def _op_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for

    li = engine_for(spark, sf_dir).catalogs.table("psql.tpch.lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .withColumnRenamed("O", "n_open")
        .withColumnRenamed("F", "n_finished")
        # empty pivot cells are NULL; coalesce so both engines render 0
        .withColumn("n_open", F.coalesce("n_open", F.lit(0)))
        .withColumn("n_finished", F.coalesce("n_finished", F.lit(0)))
    )


register(
    "op_pivot",
    _op_pivot,
    oracle="""
    SELECT l_returnflag,
           CAST(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_open,
           CAST(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_finished
    FROM lineitem
    GROUP BY l_returnflag
    """,
)


# Hopping (sliding) time-window aggregation — Spark's native
# window(ts, windowDuration, slideDuration) in batch mode, the third
# member of the time-window family next to the tumbling rollup
# (op_events_time_rollup) and session windows (op_session_window).
# Each event lands in duration/slide = 6 hopping windows; Spark's
# operator expands them with an internal generator (one scan, no join),
# and the oracle replays the same epoch-aligned expansion with
# generate_series.  Counts are exact; the value sum is an exact decimal
# aggregate cast to DOUBLE only for render parity.  Scale: the expand
# is map-side (x6 rows pre-combine), the shuffle carries one row per
# (window, type) — calendar-bounded output.
def _op_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for

    cat = engine_for(spark, sf_dir).catalogs
    ev = cat.table("elastic.default.events")
    return (
        ev.groupBy(
            F.window("ts", "6 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr("CAST(value AS DECIMAL(18,4))")).alias("__tv"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            F.col("__tv").cast("double").alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


register(
    "op_hopping_window",
    _op_hopping_window,
    oracle="""
    WITH x AS (
      SELECT ts, event_type, value,
             date_trunc('hour', ts) - k * (INTERVAL 1 HOUR) AS ws
      FROM events, LATERAL (SELECT unnest(generate_series(0, 5)) AS k)
    )
    SELECT ws AS window_start,
           ws + INTERVAL 6 HOUR AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM x
    GROUP BY ws, event_type
    ORDER BY window_start, event_type
    """,
)
