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
    matching DuckDB/pandas ``merge_asof`` semantics);
    ``direction="nearest"`` the candidate minimizing |left.on -
    right.on|, backward winning distance ties (pandas merge_asof
    nearest semantics made deterministic).

    Union-sort-fill: right rows are tagged 0, left rows 1; within each
    ``by`` partition ordered by ``on``, a running last_value (backward)
    or first_value over the following frame (forward) fills the tagged
    right payload onto each left row.  Either direction is ONE exchange
    and one window — no point-in-range explosion; ``nearest`` runs both
    fills over the SAME exchange (two window sorts, one shuffle) and
    picks per-row by distance.  Among right rows sharing one timestamp
    the fill picks the sort-adjacent one — callers needing a specific
    winner should pre-dedupe the right side.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )
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

    wb = (
        Window.partitionBy(by)
        # right (tag 0) sorts before left at timestamp ties -> inclusive
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(by)
        # left sorts before right at ties so the same-timestamp right row
        # lands inside the [current, +inf) frame -> inclusive forward
        .orderBy(F.col(on).asc(), F.col("__tag").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def pick_b(col):
        return F.last(col, ignorenulls=True).over(wb)

    def pick_f(col):
        return F.first(col, ignorenulls=True).over(wf)

    if direction == "backward":
        picks = {"": pick_b}
    elif direction == "forward":
        picks = {"": pick_f}
    else:
        picks = {"__b": pick_b, "__f": pick_f}

    filled = unioned.select(
        *[c for c in cols if not c.startswith("__r_")],
        *[
            pk(F.when(F.col("__tag") == 0, F.col(f"__r_{c}")))
            .alias(f"{c}{suffix}{tag}")
            for c in right_cols
            for tag, pk in picks.items()
        ],
        *[
            pk(F.when(F.col("__tag") == 0, F.col("__r_on")))
            .alias(f"{on}{suffix}{tag}")
            for tag, pk in picks.items()
        ],
    )
    out = filled.filter(F.col("__tag") == 1).drop("__tag")
    if direction != "nearest":
        return out
    # distance pick: backward wins ties and missing-side cases resolve
    # to the present side; subtraction works uniformly for numeric
    # (numeric delta) and timestamp (day-time interval — comparable)
    # `on` columns
    b_on, f_on = f"{on}{suffix}__b", f"{on}{suffix}__f"
    take_b = F.col(f_on).isNull() | (
        F.col(b_on).isNotNull()
        & ((F.col(on) - F.col(b_on)) <= (F.col(f_on) - F.col(on)))
    )
    proj = [c for c in out.columns
            if not c.endswith("__b") and not c.endswith("__f")]
    return out.select(
        *proj,
        *[
            F.when(take_b, F.col(f"{c}{suffix}__b"))
            .otherwise(F.col(f"{c}{suffix}__f"))
            .alias(f"{c}{suffix}")
            for c in right_cols
        ],
        F.when(take_b, F.col(b_on)).otherwise(F.col(f_on)).alias(
            f"{on}{suffix}"
        ),
    )


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


def _q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join: each purchase matched to the view
    event of the same user minimizing |Δts|, backward winning ties —
    the attribution shape when causality direction is unknown (e.g.
    matching sensor readings to the closest calibration)."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    events = engine_for(spark, sf_dir).catalogs.table("elastic.default.events")
    views = (
        events.filter(F.col("event_type") == "view")
        .select("user_id", "ts", F.col("event_id").alias("view_id"))
        .groupBy("user_id", "ts")
        .agg(F.max("view_id").alias("view_id"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases, views, on="ts", by="user_id",
        right_cols=["view_id"], direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("view_id_matched").alias("nearest_view_id"),
        F.col("ts_matched").alias("nearest_view_ts"),
    )


register(
    "join_asof_nearest",
    _q_asof_nearest,
    # DuckDB has no nearest ASOF — the oracle composes the two native
    # directions and replays the backward-wins-ties distance pick.
    oracle="""
    WITH views AS (
      SELECT user_id, ts, max(event_id) AS view_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    b AS (
      SELECT p.event_id, v.view_id AS b_id, v.ts AS b_ts
      FROM purchases p
      ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
    ),
    f AS (
      SELECT p.event_id, v.view_id AS f_id, v.ts AS f_ts
      FROM purchases p
      ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts <= v.ts
    )
    SELECT p.event_id, p.user_id,
           CASE WHEN f.f_ts IS NULL
                  OR (b.b_ts IS NOT NULL AND p.ts - b.b_ts <= f.f_ts - p.ts)
                THEN b.b_id ELSE f.f_id END AS nearest_view_id,
           CASE WHEN f.f_ts IS NULL
                  OR (b.b_ts IS NOT NULL AND p.ts - b.b_ts <= f.f_ts - p.ts)
                THEN b.b_ts ELSE f.f_ts END AS nearest_view_ts
    FROM purchases p
    JOIN b ON b.event_id = p.event_id
    JOIN f ON f.event_id = p.event_id
    """,
)
