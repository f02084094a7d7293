"""Real JDBC connector path (SURVEY §2.1 stretch): embedded Derby.

The reference's primary store is PostgreSQL behind Trino's JDBC connector
with filter/aggregate pushdown (q001 explain.txt:9).  The same engine path
here: write a table into a Derby database (the JDBC store bundled with
Spark), register it as a ``jdbc`` TableSpec, query through the 3-part
name, and assert the predicate was pushed into the JDBC source.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from dblab_ece_trino_spark.catalog import TableSpec
from dblab_ece_trino_spark.session import explain_str

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    return f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"


def test_jdbc_roundtrip_and_filter_pushdown(spark, derby_url):
    from dblab_ece_trino_spark.entrypoints import engine_for

    eng = engine_for(spark, SF_SMALL)
    nation = eng.catalogs.table("psql.tpch.nation")
    (
        nation.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "NATION")
        .mode("overwrite")
        .save()
    )
    eng.catalogs.register(
        TableSpec(
            "derby",
            "main",
            "nation",
            "jdbc",
            options={"url": derby_url, "dbtable": "NATION"},
        )
    )
    df = eng.sql(
        "SELECT n_name FROM derby.main.nation WHERE n_nationkey >= 20"
    )
    rows = {r.n_name for r in df.collect()}
    want = {r.n_name for r in nation.filter(F.col("n_nationkey") >= 20).collect()}
    assert rows == want
    plan = explain_str(df)
    # the range predicate must reach the JDBC source (reference q001
    # pushes the whole WHERE into PostgreSQL)
    assert "PushedFilters" in plan and "N_NATIONKEY" in plan.upper()


def test_jdbc_aggregate_over_connector(spark, derby_url):
    """Aggregation over the V1 JDBC relation — the q001 whole-query shape.

    The V1 ``format("jdbc")`` relation only pushes filters and column
    pruning, so here the agg runs engine-side next to the scan —
    semantically identical; the true pushdown path is the DSv2 catalog
    (next test)."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    eng = engine_for(spark, SF_SMALL)
    df = eng.sql(
        "SELECT count(*) AS n, max(n_nationkey) AS mx FROM derby.main.nation"
    )
    r = df.collect()[0]
    assert (r.n, r.mx) == (25, 24)


def test_jdbc_dsv2_aggregate_pushdown(spark, derby_url):
    """END-TO-END aggregate pushdown into the JDBC store (verdict item:
    the reference pushes a whole sum+filter into PostgreSQL,
    results/q001/workers-1/explain.txt:9).  Spark's DSv2 JDBCTableCatalog
    compiles group-by aggregates into the Derby dialect: the formatted
    plan must show PushedAggregates and the results must match the
    engine-side computation."""
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.session import explain_str

    eng = engine_for(spark, SF_SMALL)
    eng.catalogs.register_jdbc_dsv2_catalog(
        "derbyv2", derby_url, driver=DERBY_DRIVER
    )
    df = eng.spark.sql(
        "SELECT n_regionkey, count(*) AS n, max(n_nationkey) AS mx "
        "FROM derbyv2.APP.NATION GROUP BY n_regionkey"
    )
    plan = explain_str(df)
    assert "PushedAggregates" in plan, plan
    assert "MAX" in plan.upper()
    got = {(r.n_regionkey, r.n, r.mx) for r in df.collect()}
    nation = eng.catalogs.table("psql.tpch.nation")
    want = {
        (r.n_regionkey, r.n, r.mx)
        for r in nation.groupBy("n_regionkey")
        .agg(F.count("*").alias("n"), F.max("n_nationkey").alias("mx"))
        .collect()
    }
    assert got == want
