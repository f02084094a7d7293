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
    """Aggregation over the JDBC source — the q001 whole-query shape.

    Spark's DSv2 aggregate pushdown (``pushDownAggregate``, which the
    catalog enables) fires for dialects whose compiler supports it
    (PostgreSQL/MySQL/H2...); Derby's dialect does not compile
    aggregates, so here the agg runs engine-side next to the scan —
    semantically identical, and exactly what SURVEY §4 notes as the
    acceptable default plan.  Against the reference's actual PostgreSQL
    the same code pushes the whole sum+filter down.
    """
    from dblab_ece_trino_spark.entrypoints import engine_for

    eng = engine_for(spark, SF_SMALL)
    df = eng.sql(
        "SELECT count(*) AS n, max(n_nationkey) AS mx FROM derby.main.nation"
    )
    r = df.collect()[0]
    assert (r.n, r.mx) == (25, 24)
