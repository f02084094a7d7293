"""Sources: csv/json catalog formats, partitioned + bucketed sinks, salting."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from dblab_ece_trino_spark.catalog import TableSpec
from dblab_ece_trino_spark.session import explain_str


def test_csv_and_json_catalog_formats(spark, tmp_path):
    from dblab_ece_trino_spark.entrypoints import engine_for

    eng = engine_for(spark, SF_SMALL)
    nation = eng.catalogs.table("psql.tpch.nation")
    csv_path = str(tmp_path / "nation_csv")
    json_path = str(tmp_path / "nation_json")
    nation.write.option("header", "true").csv(csv_path)
    nation.write.json(json_path)

    schema = "n_nationkey int, n_name string, n_regionkey int"
    eng.catalogs.register(
        TableSpec("files", "csv", "nation", "csv", csv_path, {"schema": schema, "header": "true"})
    )
    eng.catalogs.register(
        TableSpec("files", "js", "nation", "json", json_path, {"schema": schema})
    )
    base = {(r.n_nationkey, r.n_name) for r in nation.collect()}
    got_csv = {
        (r.n_nationkey, r.n_name)
        for r in eng.sql("SELECT * FROM files.csv.nation").collect()
    }
    got_json = {
        (r.n_nationkey, r.n_name)
        for r in eng.sql("SELECT * FROM files.js.nation").collect()
    }
    assert got_csv == base
    assert got_json == base


def test_partitioned_write_prunes(spark, tmp_path):
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.sources.formats import write_partitioned

    eng = engine_for(spark, SF_SMALL)
    li = eng.catalogs.table("psql.tpch.lineitem")
    out = str(tmp_path / "li_part")
    write_partitioned(li, out, ["l_returnflag"])
    df = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    plan = explain_str(df)
    # partition pruning: the scan must carry a partition filter, and only
    # the R directory is read
    assert "PartitionFilters" in plan
    assert df.count() == li.filter(F.col("l_returnflag") == "R").count()


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Co-located join: two tables bucketed on the join key join without
    any Exchange in the physical plan — the write-once shuffle contract."""
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.sources.formats import write_bucketed

    eng = engine_for(spark, SF_SMALL)
    li = eng.catalogs.table("psql.tpch.lineitem")
    o = eng.catalogs.table("mongodb.tpch.orders")
    write_bucketed(
        li.select("l_orderkey", "l_extendedprice"), "b_lineitem", "l_orderkey", 8,
        sort_col="l_orderkey",
    )
    write_bucketed(
        o.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8,
        sort_col="o_orderkey",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # disable broadcast so the planner must use the bucketed distribution
    # (at real fact-fact scale neither side broadcasts anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = explain_str(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_agg_equals_direct(spark):
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.operators.aggregates import salted_agg

    eng = engine_for(spark, SF_SMALL)
    li = eng.catalogs.table("psql.tpch.lineitem").withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(12,2)")
    )
    direct = {
        r.l_returnflag: (r.s, r.c)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("qty_dec").alias("s"), F.count("*").alias("c"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.s, r.c)
        for r in salted_agg(
            li, ["l_returnflag"], sums={"qty_dec": "s"}, count_alias="c", n_salts=16
        ).collect()
    }
    assert direct == salted


def test_json_schema_inference_es_analog(spark, tmp_path):
    """SURVEY §1.3: the elastic catalog's schemas are *inferred* from the
    JSON documents (dynamic mapping); the json format without a declared
    schema exercises the same path — numeric keys surface as bigint,
    exactly as TPC-DS surrogate keys do in the reference's ES catalog."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    eng = engine_for(spark, SF_SMALL)
    events = eng.catalogs.table("elastic.default.events").limit(200)
    path = str(tmp_path / "events_json")
    events.select("event_id", "user_id", "event_type", "value").write.json(path)
    eng.catalogs.register(
        TableSpec("elastic2", "inferred", "events", "json", path, {})
    )
    df = eng.sql(
        "SELECT event_type, count(*) AS n, sum(user_id) AS su "
        "FROM elastic2.inferred.events GROUP BY event_type"
    )
    schema = {f.name: f.dataType.simpleString() for f in
              eng.catalogs.table("elastic2.inferred.events").schema.fields}
    assert schema["event_id"] == "bigint"  # inferred, not declared
    assert schema["value"] == "double"
    total = sum(r.n for r in df.collect())
    assert total == 200


def test_generator_catalog_deterministic_and_scaled(spark):
    """TPC-DS generator source parity (reference loader.py:166
    tpcds.sfN.*): deterministic across scans, fact rows scale with sf,
    dims don't, and the q001-shape query runs over tpcds.sf1 tables."""
    from pyspark.sql import functions as F

    from dblab_ece_trino_spark.catalog import CatalogRegistry
    from dblab_ece_trino_spark.sources.generator import gen_table, table_rows

    # determinism: two independent scans produce identical rows
    a = gen_table(spark, "store_sales", sf=0.1)
    b = gen_table(spark, "store_sales", sf=0.1)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # scaling: facts linear in sf, dims constant
    assert table_rows("store_sales", 2.0) == 2 * table_rows("store_sales", 1.0)
    assert table_rows("date_dim", 2.0) == table_rows("date_dim", 1.0)
    # registered catalog: the reference's q001 shape runs over it
    reg = CatalogRegistry(spark)
    reg.register_generator_schema(sf=0.1)
    df = spark.sql(
        "SELECT CAST(sum(CAST(ss_sales_price AS DECIMAL(18,2))) AS DOUBLE) AS sales "
        f"FROM {reg.lookup('tpcds', 'sf0_1', 'store_sales').view_name} "
        "WHERE ss_sold_date_sk BETWEEN 2451545 AND 2488070"
    )
    assert df.collect()[0].sales > 0
    # FK domains: every sold_date_sk resolves against date_dim
    ss = reg.table("tpcds.sf0_1.store_sales")
    dd = reg.table("tpcds.sf0_1.date_dim")
    unmatched = ss.join(
        dd, ss.ss_sold_date_sk == dd.d_date_sk, "left_anti"
    ).count()
    assert unmatched == 0
    # customer names are blank-padded char(20)/char(30) — the reference's
    # char-discipline trap (q005 explain.txt:32) is reproduced, and the
    # catalog's char_columns option undoes it at scan time
    cust = reg.table("tpcds.sf0_1.customer")
    pad = cust.filter(F.col("c_first_name").endswith(" ")).count()
    assert pad > 0
    from dblab_ece_trino_spark.catalog import TableSpec

    reg.register(
        TableSpec(
            "tpcds", "clean", "customer", "generator",
            options={"table": "customer", "sf": "0.1",
                     "char_columns": "c_first_name,c_last_name"},
        )
    )
    clean = reg.table("tpcds.clean.customer")
    assert clean.filter(F.col("c_first_name").endswith(" ")).count() == 0


def test_orc_catalog_format_roundtrip_with_pushdown(spark, tmp_path):
    """ORC rides the generic connector pass-through (catalog.py load()
    else-branch): register an orc TableSpec, query by 3-part name, and
    the filter must reach the ORC scan (ORC carries min/max stripe
    stats exactly like parquet footers)."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    eng = engine_for(spark, SF_SMALL)
    nation = eng.catalogs.table("psql.tpch.nation")
    path = str(tmp_path / "nation_orc")
    nation.write.mode("overwrite").orc(path)
    eng.catalogs.register(
        TableSpec("lake", "fmt", "nation_orc", "orc", path=path)
    )
    df = eng.sql(
        "SELECT n_name FROM lake.fmt.nation_orc WHERE n_nationkey >= 20"
    )
    got = {r.n_name for r in df.collect()}
    want = {r.n_name for r in nation.filter(F.col("n_nationkey") >= 20).collect()}
    assert got == want
    plan = explain_str(df)
    assert "Format: ORC" in plan or "orc" in plan.lower()
    assert "GreaterThanOrEqual(n_nationkey,20)" in plan
