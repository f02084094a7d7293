"""DataFrame-API constructions of the five reference queries.

SURVEY §7.3: each reference query exists both as engine SQL text
(queries.py, through the 3-part-name rewrite) and as a DataFrame build —
the two Catalyst entry points (§3.1).  Equivalence of the two paths per
query is asserted in tests/test_df_variants.py; both compile to the same
logical shapes, so this doubles as a regression net for the rewrite layer.

Column aliases match queries.py exactly (the oracle-comparison contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dblab_ece_trino_spark.entrypoints import engine_for


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return engine_for(spark, sf_dir).catalogs.table(name)


def q001_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "psql.tpch.lineitem")
    return (
        li.filter(F.col("l_orderkey").between(1000, 9000))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sales")
        )
    )


def q002_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "mongodb.tpch.orders")
    return (
        o.filter(F.col("o_orderkey").between(1000, 9000))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sales")
        )
    )


def q003_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "mongodb.tpch.orders")
    c = _t(spark, sf_dir, "psql.tpch.customer")
    return (
        o.filter(F.col("o_orderkey").between(1000, 9000))
        # dim side broadcast — the reference's REPLICATED join
        # (q003 explain.txt:49-62); Catalyst would choose this anyway at
        # these sizes, the hint pins it for plan stability
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("orders"))
        .orderBy(F.col("orders").desc())
        .limit(20)
    )


def q004_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "psql.tpch.lineitem")
    r = _t(spark, sf_dir, "psql.tpch.supplier")
    sr = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("sr_orderkey"),
            F.col("l_linenumber").alias("sr_linenumber"),
            F.when(F.col("l_partkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("l_suppkey"))
            .alias("sr_reason_sk"),
            (
                F.col("l_quantity").cast("decimal(12,2)")
                - F.col("l_linenumber").cast("decimal(12,2)")
            ).alias("sr_return_quantity"),
        )
    )
    ss = li.alias("ss")
    joined = (
        ss.join(
            sr,
            (F.col("sr_orderkey") == F.col("ss.l_orderkey"))
            & (F.col("sr_linenumber") == F.col("ss.l_linenumber")),
            "left",
        )
        # inner join on the nullable sr column silently drops
        # unmatched-left rows — preserved exactly (SURVEY §7.5)
        .join(r, F.col("sr_reason_sk") == F.col("s_suppkey"), "inner")
        .select(
            F.col("ss.l_suppkey").alias("ss_customer_sk"),
            F.when(
                F.col("sr_return_quantity").isNotNull(),
                (
                    F.col("ss.l_quantity").cast("decimal(12,2)")
                    - F.col("sr_return_quantity")
                )
                * F.col("ss.l_extendedprice").cast("decimal(18,2)"),
            )
            .otherwise(
                F.col("ss.l_quantity").cast("decimal(12,2)")
                * F.col("ss.l_extendedprice").cast("decimal(18,2)")
            )
            .alias("act_sales"),
        )
    )
    return (
        joined.groupBy("ss_customer_sk")
        .agg(F.sum("act_sales").cast("decimal(18,2)").cast("double").alias("sumsales"))
        .orderBy(F.col("sumsales").asc(), F.col("ss_customer_sk").asc())
        .limit(100)
    )


def q005_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "psql.tpch.lineitem")
    o = _t(spark, sf_dir, "mongodb.tpch.orders")
    c = _t(spark, sf_dir, "psql.tpch.customer")
    e = _t(spark, sf_dir, "elastic.default.events")
    lo, hi = F.lit("1996-01-01").cast("date"), F.lit("1996-12-31").cast("date")

    def channel(df: DataFrame, ts_col: str, cust_col: str) -> DataFrame:
        d = F.col(ts_col).cast("date")
        return (
            df.join(c, F.col(cust_col) == c.c_custkey)
            .filter(d.between(lo, hi))
            .select(F.col("c_name"), d.alias("d_date"))
            .distinct()
        )

    store = channel(
        li.join(o, li.l_orderkey == o.o_orderkey), "l_shipdate", "o_custkey"
    )
    catalog = channel(o, "o_orderdate", "o_custkey")
    web = channel(e, "ts", "user_id")
    # EXCEPT (distinct), chained — subtract() is Spark's EXCEPT DISTINCT;
    # Catalyst rewrites it to left-anti joins (ReplaceExceptWithAntiJoin)
    cool = store.subtract(catalog).subtract(web)
    return cool.agg(F.count("*").alias("cool_cust_count"))


def tpch_q17_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual decorrelation of tpch_q17's correlated scalar subqueries.

    The DataFrame API has no correlated-subquery construct — the
    idiomatic form IS the decorrelated plan Catalyst produces for the SQL
    path (queries_advanced.py): aggregate lineitem once per partkey, join
    the thresholds back, filter.  Equality with the SQL path (asserted in
    tests/test_df_variants.py) pins that RewriteCorrelatedScalarSubquery
    and the hand-built plan agree row-for-row.
    """
    li = _t(spark, sf_dir, "psql.tpch.lineitem")
    p = _t(spark, sf_dir, "psql.tpch.part")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").alias("n_lines"),
        F.sum(qty).alias("sum_qty"),
    )
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(p.p_brand == "Brand#1")
        .join(per_part, li.l_partkey == per_part.pk)
        .filter(qty * 5 * F.col("n_lines") < F.col("sum_qty"))
    )
    return joined.agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_price"),
        F.count("*").alias("n_lines"),
    )
