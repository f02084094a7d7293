"""SQL path ≡ DataFrame path for every reference query (SURVEY §7.3)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL, normalized_rows


@pytest.mark.parametrize("name", ["q001", "q002", "q003", "q004", "q005", "tpch_q17"])
def test_sql_and_dataframe_paths_agree(name, spark):
    from dblab_ece_trino_spark import queries_df
    from dblab_ece_trino_spark.entrypoints import build_queries

    sql_df = build_queries()[name](spark, SF_SMALL)
    df_df = getattr(queries_df, f"{name}_df")(spark, SF_SMALL)
    assert [c.lower() for c in sql_df.columns] == [
        c.lower() for c in df_df.columns
    ]
    a = normalized_rows(sql_df.columns, [tuple(r) for r in sql_df.collect()])
    b = normalized_rows(df_df.columns, [tuple(r) for r in df_df.collect()])
    assert a == b, f"{name}: SQL and DataFrame paths disagree"


def test_resample_fill_grid_invariants(spark):
    """Grid is dense (one row per hour between each key's bounds),
    n_events reconciles to the raw event count, and fill rows carry a
    non-null value whenever any prior observation exists."""
    from pyspark.sql import functions as F

    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.operators.timeseries import resample_fill

    ev = (
        engine_for(spark, SF_SMALL)
        .catalogs.table("elastic.default.events")
        .filter(F.col("user_id") < 10)
    )
    out = resample_fill(ev)
    per_user = out.groupBy("user_id").agg(
        F.count("*").alias("rows"),
        F.min("bucket").alias("lo"),
        F.max("bucket").alias("hi"),
        F.sum("n_events").alias("n"),
    )
    bad_density = per_user.filter(
        F.col("rows")
        != (F.unix_timestamp("hi") - F.unix_timestamp("lo")) / 3600 + 1
    ).count()
    assert bad_density == 0
    total = {r.user_id: r.n for r in per_user.collect()}
    raw = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert total == raw
    # after the first observation every row must be filled
    assert out.filter(F.col("filled_value").isNull()).count() == 0
