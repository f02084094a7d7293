"""Time-series operators: grid resampling with gap fill — the
"hypertable" surface (continuous-aggregate rollup lives in
operators/relational.op_events_time_rollup; as-of correlation in
operators/joins.join_asof).

``resample_fill`` densifies each key's event stream onto a fixed time
grid and forward-fills the last observation into empty buckets — the
state-of-meter semantics every monitoring/feature pipeline needs before
window features can be computed.

Shape at 100 TB: the per-bucket "last observation" is a keyed window
(one hash shuffle); the grid is generated per key from its own
[min, max] bounds (sequence + explode — a projection, rows created
executor-side, never through the driver); the fill is one more window
over the SAME (key, time) partitioning, so AQE/Catalyst reuse the
exchange.  Grid cardinality is sum over keys of (span/step) — bounded
and predictable, unlike a cross join against a global calendar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblab_ece_trino_spark.operators.registry import register


def resample_fill(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    step: str = "1 hour",
) -> DataFrame:
    """Per-key fixed-step resampling with forward fill.

    Buckets are ``date_trunc('hour')`` of the event time; each bucket
    keeps its LAST observation (ts desc, tiebreak desc — deterministic);
    empty buckets between a key's first and last event carry the
    previous bucket's value (``last(..., ignorenulls)``), with
    ``n_events = 0`` marking the fill rows.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    e = events.select(
        F.col(id_col), hour.alias("bucket"), F.col(ts_col), F.col(tiebreak),
        F.col(value_col),
    )
    w_last = Window.partitionBy(id_col, "bucket").orderBy(
        F.col(ts_col).desc(), F.col(tiebreak).desc()
    )
    last_in_bucket = (
        e.withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select(id_col, "bucket", F.col(value_col).alias("__v"))
    )
    counts = e.groupBy(id_col, "bucket").agg(F.count("*").alias("__n"))
    bounds = e.groupBy(id_col).agg(
        F.min("bucket").alias("__h0"), F.max("bucket").alias("__h1")
    )
    grid = bounds.select(
        id_col,
        F.explode(
            F.sequence(F.col("__h0"), F.col("__h1"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    w_fill = (
        Window.partitionBy(id_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(last_in_bucket, [id_col, "bucket"], "left")
        .join(counts, [id_col, "bucket"], "left")
        .select(
            id_col,
            "bucket",
            F.coalesce("__n", F.lit(0)).cast("long").alias("n_events"),
            F.last("__v", ignorenulls=True).over(w_fill).alias("filled_value"),
        )
    )


# ------------------------------------------------------------ query entry
def _q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for

    ev = engine_for(spark, sf_dir).catalogs.table("elastic.default.events")
    # bounded key slice: the entry's grid cardinality stays constant-per-
    # key as the corpus grows (full-corpus form is the API above)
    return resample_fill(ev.filter(F.col("user_id") < 20))


register(
    "ts_gap_fill",
    _q_gap_fill,
    """
    WITH e AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, ts, event_id, value
      FROM events WHERE user_id < 20
    ),
    last_in_bucket AS (
      SELECT user_id, bucket, value FROM (
        SELECT user_id, bucket, value,
               row_number() OVER (
                 PARTITION BY user_id, bucket
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM e
      ) WHERE rn = 1
    ),
    counts AS (
      SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS n FROM e
      GROUP BY user_id, bucket
    ),
    b AS (
      SELECT user_id, min(bucket) AS h0, max(bucket) AS h1 FROM e
      GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket
      FROM b
    )
    SELECT g.user_id, g.bucket,
           coalesce(c.n, 0) AS n_events,
           last_value(l.value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM grid g
    LEFT JOIN last_in_bucket l ON g.user_id = l.user_id AND g.bucket = l.bucket
    LEFT JOIN counts c ON g.user_id = c.user_id AND g.bucket = c.bucket
    """,
)
