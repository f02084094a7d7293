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


def test_jdbc_join_pushdown_via_query_scan(spark, derby_url):
    """Join pushdown (SURVEY §4 stretch; reference pushes a whole join
    into PostgreSQL, results/q004/workers-1/explain.txt:70): a JDBC
    TableSpec whose options carry a ``query`` executes the join INSIDE
    the remote store — the engine sees one relation, so the plan contains
    a single JDBC scan and no engine-side join."""
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.session import explain_str

    eng = engine_for(spark, SF_SMALL)
    region = eng.catalogs.table("psql.tpch.region")
    for tbl, src in (("REGION", region), ("NATION", eng.catalogs.table("psql.tpch.nation"))):
        (
            src.write.format("jdbc")
            .option("url", derby_url)
            .option("dbtable", tbl)
            .mode("overwrite")
            .save()
        )
    # Spark's JDBC writer created the Derby tables with quoted lowercase
    # column names and CLOB strings, so the pushed query quotes names and
    # casts to VARCHAR before grouping (Derby cannot GROUP BY a CLOB).
    pushed = (
        'SELECT "r_name", count(*) AS "n" FROM ('
        'SELECT CAST("r_name" AS VARCHAR(64)) AS "r_name" '
        'FROM NATION, REGION WHERE "n_regionkey" = "r_regionkey"'
        ') t GROUP BY "r_name"'
    )
    eng.catalogs.register(
        TableSpec(
            "derby", "main", "nation_by_region", "jdbc",
            options={"url": derby_url, "query": pushed},
        )
    )
    df = eng.sql("SELECT * FROM derby.main.nation_by_region ORDER BY r_name")
    rows = {(r.r_name.strip(), r.n) for r in df.collect()}
    nation = eng.catalogs.table("psql.tpch.nation")
    want = {
        (r.r_name.strip(), r.n)
        for r in nation.join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name").agg(F.count("*").alias("n")).collect()
    }
    assert rows == want
    plan = explain_str(df)
    # one remote relation, no engine-side join operator
    assert "JDBCRelation" in plan or "JDBCScan" in plan.replace(" ", ""), plan
    assert "Join" not in plan.split("PushedFilters")[0].split("Scan")[0], plan


def test_jdbc_dsv2_join_pushdown_wiring(spark, derby_url):
    """Native DSv2 whole-join pushdown (SURVEY §4; reference pushes the
    q004/q005 joins into PostgreSQL) is wired on: the session conf and
    the catalog's pushDownJoin option are set, so a PostgreSQL/MySQL/
    Oracle deployment gets remote joins with no code changes.  Spark
    gates the rewrite per dialect and Derby — the only store bundled in
    this container — has no join SQL generation, so here the plan must
    fall back to an engine-side join that still pushes each scan's
    filters remotely (results stay correct); the query-option scan test
    above is the in-container end-to-end demonstration of remote-join
    semantics."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    eng = engine_for(spark, SF_SMALL)
    for tbl, src in (
        ("NATION_J", eng.catalogs.table("psql.tpch.nation")),
        ("REGION_J", eng.catalogs.table("psql.tpch.region")),
    ):
        (
            src.write.format("jdbc")
            .option("url", derby_url)
            .option("dbtable", tbl)
            .mode("overwrite")
            .save()
        )
    assert (
        eng.spark.conf.get("spark.sql.optimizer.datasourceV2JoinPushdown")
        == "true"
    )
    eng.catalogs.register_jdbc_dsv2_catalog(
        "derbyjoin", derby_url, driver=DERBY_DRIVER
    )
    assert (
        eng.spark.conf.get("spark.sql.catalog.derbyjoin.pushDownJoin")
        == "true"
    )
    df = eng.spark.sql(
        "SELECT n.n_name, r.r_name FROM derbyjoin.APP.NATION_J n "
        "JOIN derbyjoin.APP.REGION_J r ON n.n_regionkey = r.r_regionkey "
        "WHERE n.n_nationkey >= 20"
    )
    plan = explain_str(df)
    # Derby fallback: engine-side join, but the filter still reaches the
    # remote scan
    assert "PushedFilters" in plan
    assert "n_nationkey" in plan or "N_NATIONKEY" in plan.upper()
    assert df.count() == 5


def test_ctas_load_jdbc_end_to_end(spark, derby_url):
    """Reference data-loader parity: parallel CTAS into the JDBC store,
    destination-verified row counts, and 3-part-name querying against
    the loaded copies with pushdown."""
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.loader import ctas_load_jdbc

    eng = engine_for(spark, SF_SMALL)
    reports = ctas_load_jdbc(
        eng,
        SF_SMALL,
        derby_url,
        ["region", "nation"],
        catalog="derbyload",
        schema="tpch",
    )
    by_table = {r.table: r for r in reports}
    assert by_table["region"].rows == 5
    assert by_table["nation"].rows == 25
    df = eng.sql(
        "SELECT r.r_name, count(*) AS n "
        "FROM derbyload.tpch.nation n, derbyload.tpch.region r "
        "WHERE n.n_regionkey = r.r_regionkey "
        "GROUP BY r.r_name ORDER BY r.r_name"
    )
    rows = df.collect()
    assert [r.n for r in rows] == [5, 5, 5, 5, 5]
    plan = explain_str(df)
    assert "JDBCRelation" in plan or "jdbc" in plan.lower()
