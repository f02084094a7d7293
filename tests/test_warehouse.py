"""Warehouse-maintenance operators: oracle parity (tests/test_correctness
covers the graded entries) plus structural invariants the oracle can't
see."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _events(spark):
    from dblab_ece_trino_spark.entrypoints import engine_for

    return engine_for(spark, SF_SMALL).catalogs.table("elastic.default.events")


def test_latest_by_key_is_argmax(spark):
    from dblab_ece_trino_spark.operators.warehouse import latest_by_key

    ev = _events(spark)
    out = latest_by_key(ev, ["user_id"], "ts", tiebreak=["event_id"])
    assert out.count() == ev.select("user_id").distinct().count()
    maxes = ev.groupBy("user_id").agg(F.max("ts").alias("mx"))
    bad = out.join(maxes, "user_id").filter(F.col("ts") != F.col("mx")).count()
    assert bad == 0


def test_scd2_intervals_partition_time(spark):
    """Per key: intervals are contiguous (each valid_to equals the next
    valid_from), exactly one open interval, and consecutive intervals
    always change the tracked attribute."""
    from dblab_ece_trino_spark.operators.warehouse import scd2_intervals
    from pyspark.sql import Window

    out = scd2_intervals(
        _events(spark), ["user_id"], "ts", ["event_type"], tiebreak=["event_id"]
    )
    w = Window.partitionBy("user_id").orderBy("valid_from")
    checked = out.select(
        "user_id",
        "event_type",
        "valid_from",
        "valid_to",
        F.lead("valid_from").over(w).alias("next_from"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    gaps = checked.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    ).count()
    assert gaps == 0
    open_per_user = (
        out.filter(F.col("valid_to").isNull()).groupBy("user_id").count()
    )
    assert open_per_user.filter(F.col("count") != 1).count() == 0
    no_change = checked.filter(
        F.col("next_type").isNotNull() & (F.col("event_type") == F.col("next_type"))
    ).count()
    assert no_change == 0


def test_snapshot_diff_matches_recipe(spark):
    from dblab_ece_trino_spark.operators.warehouse import snapshot_diff

    ev = _events(spark).select("event_id", "user_id", "event_type", "value")
    new = ev.filter(F.col("event_id") % 7 != 0).withColumn(
        "value",
        F.when(F.col("event_id") % 5 == 1, F.round(F.col("value") + 1.5, 2)).otherwise(
            F.col("value")
        ),
    )
    got = {
        r.status: r.n
        for r in snapshot_diff(ev, new, ["event_id"])
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_removed = ev.filter(F.col("event_id") % 7 == 0).count()
    n_changed = ev.filter(
        (F.col("event_id") % 7 != 0) & (F.col("event_id") % 5 == 1)
    ).count()
    assert got.get("removed", 0) == n_removed
    assert got.get("changed", 0) == n_changed
    assert "added" not in got
    # symmetry: swapping snapshots turns removed into added
    rev = {
        r.status: r.n
        for r in snapshot_diff(new, ev, ["event_id"])
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert rev.get("added", 0) == n_removed


def test_zorder_layout_invariants(spark):
    """File assignment covers all rows, file ids are bounded, and the
    z-order zone maps actually prune: the mean per-file custkey span is
    a small fraction of the global span (single-column sorts can't give
    both dims that property)."""
    from dblab_ece_trino_spark.entrypoints import build_queries
    from tests.conftest import SF_MED

    rows = build_queries()["wh_zorder_layout"](spark, SF_MED).collect()
    assert 1 <= len(rows) <= 64
    assert all(0 <= r.file_id < 64 for r in rows)
    eng_orders = spark.read.parquet(f"{SF_MED}/orders.parquet")
    assert sum(r.n_rows for r in rows) == eng_orders.count()
    glob_span = max(r.max_custkey for r in rows) - min(
        r.min_custkey for r in rows
    )
    mean_span = sum(r.max_custkey - r.min_custkey for r in rows) / len(rows)
    assert mean_span < 0.5 * glob_span


def test_gdpr_erasure_cascade_counts(spark):
    """Per-table erase counts equal independently-computed semi-join
    counts, and the revenue total equals the exact-cents sum over the
    affected lineitems."""
    from dblab_ece_trino_spark.entrypoints import build_queries
    from dblab_ece_trino_spark.operators.sketches import hexint_col
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    rows = {
        r.table_name: r
        for r in build_queries()["wh_gdpr_erasure"](spark, SF_SMALL).collect()
    }
    assert set(rows) == {"customer", "orders", "lineitem"}
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    victims = cust.filter(
        hexint_col(F.concat(F.lit("gdpr1"), F.col("c_custkey").cast("string")), 4) < 6554
    ).select("c_custkey")
    n_v = victims.count()
    assert rows["customer"].rows_to_erase == n_v
    assert 0 < n_v < cust.count()  # cohort is a strict, non-empty subset
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    vo = orders.join(
        victims, orders.o_custkey == victims.c_custkey, "semi"
    ).select("o_orderkey")
    assert rows["orders"].rows_to_erase == vo.count()
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    vl = li.join(vo, li.l_orderkey == vo.o_orderkey, "semi")
    assert rows["lineitem"].rows_to_erase == vl.count()
    want_rev = vl.select(
        F.sum(F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
    ).collect()[0][0]
    assert rows["lineitem"].revenue_e2 == want_rev
    assert rows["customer"].revenue_e2 == 0 and rows["orders"].revenue_e2 == 0
