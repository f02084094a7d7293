"""Join operators Spark lacks natively: as-of join, range/interval join.

The reference engine's five queries use only equi joins (SURVEY §2.3),
but a reference user doing time-series or pipeline work reaches for these
next; both are built as compositions of built-in operators with
cluster-scale shuffle shapes — no Python in the hot path.

- ``asof_join``: for each left row, the latest right row at-or-before its
  timestamp within the same key.  Implemented as union → one shuffle+sort
  per key → forward-fill via a running ``last_value(ignoreNulls)`` window.
  One exchange total, no point-in-range explosion — the canonical
  distributed as-of shape (what you'd do for 100 TB of ticks).
- ``range_join_bucketed``: point-in-interval join via bucketization: the
  point side maps to bucket ``p DIV w``; the interval side explodes to
  every bucket it overlaps; an equi-join on the bucket id meets them and
  an exact predicate refines.  Turns an O(n·m) nested loop into a
  shuffle join whose fan-out is interval_width / bucket_width.
- ``range_join``: the naive broadcast variant (correct for small interval
  sides; Catalyst plans a BroadcastNestedLoopJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblab_ece_trino_spark.operators.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_matched",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row the nearest right row sharing the
    ``by`` key — ``direction="backward"`` (default) takes the latest
    right row with ``right.on <= left.on``; ``direction="forward"`` the
    earliest right row with ``right.on >= left.on`` (both inclusive,
    matching DuckDB/pandas ``merge_asof`` semantics).

    Union-sort-fill: right rows are tagged 0, left rows 1; within each
    ``by`` partition ordered by ``on``, a running last_value (backward)
    or first_value over the following frame (forward) fills the tagged
    right payload onto each left row.  Either direction is ONE exchange
    and one window — no point-in-range explosion.  Among right rows
    sharing one timestamp the fill picks the sort-adjacent one —
    callers needing a specific winner should pre-dedupe the right side.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]
    l_tagged = left.withColumn("__tag", F.lit(1))
    for c in right_cols:
        l_tagged = l_tagged.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    l_tagged = l_tagged.withColumn("__r_on", F.lit(None).cast(right.schema[on].dataType))

    r_tagged = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(on).alias("__r_on"),
    )
    for c in left.columns:
        if c not in (on, by):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = [by, on, "__tag", *[f"__r_{c}" for c in right_cols], "__r_on"] + [
        c for c in left.columns if c not in (on, by)
    ]
    unioned = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    if direction == "backward":
        # right (tag 0) sorts before left at timestamp ties -> inclusive
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("__tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

        def pick(col):
            return F.last(col, ignorenulls=True).over(w)

    else:
        # left sorts before right at ties so the same-timestamp right row
        # lands inside the [current, +inf) frame -> inclusive forward
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("__tag").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )

        def pick(col):
            return F.first(col, ignorenulls=True).over(w)

    filled = unioned.select(
        *[c for c in cols if not c.startswith("__r_") ],
        *[
            pick(F.when(F.col("__tag") == 0, F.col(f"__r_{c}")))
            .alias(f"{c}{suffix}")
            for c in right_cols
        ],
        pick(F.when(F.col("__tag") == 0, F.col("__r_on")))
        .alias(f"{on}{suffix}"),
    )
    return filled.filter(F.col("__tag") == 1).drop("__tag")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Naive point-in-interval join (broadcast nested loop).  Correct for
    small interval sides; use ``range_join_bucketed`` when both sides are
    large."""
    cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    return points.join(F.broadcast(intervals), cond)


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval join as an equi-join on coarse buckets + refine.

    The interval side explodes to ceil(width/bucket_width)+1 bucket rows;
    both sides shuffle on the bucket id.  Choose bucket_width near the
    typical interval width so fan-out stays O(1) — the standard trick for
    big-big range joins (Spark has no native interval join; this is what
    its absence costs: one explode + one equi shuffle).
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    return p.join(iv, "__bucket").filter(cond).drop("__bucket")


# ------------------------------------------------------------ query entries
def _q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for

    events = engine_for(spark, sf_dir).catalogs.table("elastic.default.events")
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select("user_id", "ts", F.col("event_id").alias("signup_id"))
        # one deterministic signup per (user, ts): keep the max id
        .groupBy("user_id", "ts")
        .agg(F.max("signup_id").alias("signup_id"))
    )
    out = asof_join(
        events.select("event_id", "user_id", "ts"),
        signups,
        on="ts",
        by="user_id",
        right_cols=["signup_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("signup_id_matched").alias("signup_id"),
    )


register(
    "join_asof",
    _q_asof,
    # DuckDB's native ASOF JOIN expresses the same semantics independently.
    oracle="""
    WITH signups AS (
      SELECT user_id, ts, max(event_id) AS signup_id
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, s.signup_id
    FROM events e
    ASOF LEFT JOIN signups s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)


def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for

    li = engine_for(spark, sf_dir).catalogs.table("psql.tpch.lineitem")
    bands = spark.range(0, 12).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 5000.0).alias("lo"),
        ((F.col("id") + 1) * 5000.0 - 0.01).alias("hi"),
    )
    out = range_join_bucketed(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        bands,
        "l_extendedprice",
        "lo",
        "hi",
        bucket_width=5000.0,
    )
    return (
        out.groupBy("band_id")
        .agg(F.count("*").alias("n"))
        .orderBy("band_id")
    )


register(
    "join_range",
    _q_range_join,
    oracle="""
    WITH bands AS (
      SELECT i AS band_id, i * 5000.0 AS lo, (i + 1) * 5000.0 - 0.01 AS hi
      FROM (SELECT unnest(generate_series(0, 11)) AS i)
    )
    SELECT band_id, count(*) AS n
    FROM lineitem JOIN bands
      ON l_extendedprice >= lo AND l_extendedprice <= hi
    GROUP BY band_id
    ORDER BY band_id
    """,
)


def _q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for

    events = engine_for(spark, sf_dir).catalogs.table("elastic.default.events")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("event_id").alias("purchase_id"))
        .groupBy("user_id", "ts")
        .agg(F.max("purchase_id").alias("purchase_id"))
    )
    out = asof_join(
        events.select("event_id", "user_id", "ts"),
        purchases,
        on="ts",
        by="user_id",
        right_cols=["purchase_id"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("purchase_id_matched").alias("next_purchase_id"),
    )


register(
    "join_asof_forward",
    _q_asof_forward,
    # DuckDB ASOF with the inequality flipped = nearest-following match.
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, max(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, p.purchase_id AS next_purchase_id
    FROM events e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
)
