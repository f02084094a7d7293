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


def _register_sql_entries() -> None:
    """SQL-template time-series entries (identical relational shapes on
    both engines; see module docstring for the 100 TB rationale)."""
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    def both(name: str, spark_tpl: str, oracle_tpl: str | None = None) -> None:
        oracle_tpl = oracle_tpl if oracle_tpl is not None else spark_tpl
        register_sql(
            name,
            spark_tpl.format(**_SPARK_TABLES),
            oracle_tpl.format(**_ORACLE_TABLES),
        )

    # Rolling z-score anomaly flag: per-key 20-row trailing window mean /
    # sample stddev, scored on full windows only (warm-up rows dropped).
    # One hash shuffle on the key; the window is bounded (ROWS frame), so
    # executor memory is O(frame), not O(partition) — survives any key
    # cardinality.  Entry bounded to a key slice for a constant-size
    # graded result; the shape is key-count-invariant.
    #
    # Moments are accumulated as exact DECIMAL window sums (sum, sum of
    # squares) and mean/sigma derived from them with an identical double
    # expression on both engines — float-native windowed avg/stddev
    # differ in the last ulps between Spark's retraction updates and
    # DuckDB's segment tree, which flips rounded digits at boundaries.
    # The variance argument is clamped with greatest(.., 0): double
    # rounding of the exact sums can drive a zero-variance window's
    # argument slightly negative, where Spark yields NaN (masked by the
    # sigma > 0 guard) but DuckDB raises on sqrt of a negative.
    both(
        "ts_zscore_anomaly",
        """
        WITH w AS (
          SELECT user_id, ts, event_id, value,
                 sum(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sx,
                 sum(CAST(value AS DECIMAL(18,6))
                     * CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sxx,
                 count(*) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS n
          FROM {events}
          WHERE user_id < 40
        ),
        m AS (
          SELECT user_id, ts, event_id, value, sx,
                 CAST(sx AS DOUBLE) / 20 AS mu,
                 sqrt(greatest((CAST(sxx AS DOUBLE)
                       - 20 * (CAST(sx AS DOUBLE) / 20)
                           * (CAST(sx AS DOUBLE) / 20)) / 19, 0)) AS sigma
          FROM w
          WHERE n = 20
        )
        SELECT user_id, ts, event_id,
               CAST(CAST(sx * 0.05 AS DECIMAL(20, 8)) AS DOUBLE)
                 AS rolling_mean,
               CAST(round(
                 CASE WHEN sigma > 0
                      THEN (value - mu) / sigma END, 3) AS DOUBLE) AS zscore,
               CAST(coalesce(sigma > 0
                             AND abs(value - mu) > 2.5 * sigma,
                             FALSE) AS BOOLEAN) AS is_anomaly
        FROM m
        ORDER BY user_id, ts, event_id
        """,
    )

    # Expanding per-key z-score — the driver-gradable BATCH ANALOG of
    # the streaming anomaly detector (streaming/events.anomaly_stream):
    # each event is scored against the moments of all PRIOR events of
    # its key (UNBOUNDED PRECEDING TO 1 PRECEDING), the exact semantics
    # the stateful operator computes at arrival time.  Same exact-
    # DECIMAL moment discipline and greatest(.., 0) clamp as the
    # trailing-window entry above; tests/test_streaming.py pins the
    # streaming output to this entry's math.  One keyed window (hash
    # shuffle on user_id); the frame is expanding but the running sums
    # are O(1) per row — scales like any keyed cumsum.
    both(
        "ts_expanding_anomaly",
        """
        WITH w AS (
          SELECT user_id, ts, event_id, value,
                 count(*) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS n_prior,
                 sum(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS sx,
                 sum(CAST(value AS DECIMAL(18,6))
                     * CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS sxx
          FROM {events}
          WHERE user_id < 40
        ),
        m AS (
          SELECT user_id, ts, event_id, value,
                 CAST(n_prior AS BIGINT) AS n_prior,
                 CASE WHEN n_prior > 0
                      THEN CAST(sx AS DOUBLE) / n_prior END AS mu,
                 CASE WHEN n_prior > 1 THEN
                   sqrt(greatest((CAST(sxx AS DOUBLE)
                         - n_prior * (CAST(sx AS DOUBLE) / n_prior)
                             * (CAST(sx AS DOUBLE) / n_prior))
                        / (n_prior - 1), 0)) END AS sigma
          FROM w
        )
        SELECT user_id, ts, event_id, n_prior,
               CAST(round(CASE WHEN n_prior >= 5 AND sigma > 0
                               THEN (value - mu) / sigma END, 3)
                    AS DOUBLE) AS zscore,
               CAST(coalesce(n_prior >= 5 AND sigma > 0
                             AND abs(value - mu) > 2.5 * sigma,
                             FALSE) AS BOOLEAN) AS is_anomaly
        FROM m
        ORDER BY user_id, ts, event_id
        """,
    )

    # EWMA over a bounded 10-row kernel, unrolled as lag() terms inside
    # ONE window operator: one shuffle on the key, one scan, zero joins
    # (plan-asserted).  Weights a^lag renormalize over the rows actually
    # present, so warm-up rows are exact.  (The first formulation — a
    # lag-explode + equi-join convolution — was measured and discarded:
    # Catalyst inlines the CTE into two window passes + a join, i.e. a
    # second full scan at 100 TB.  The join form only wins for kernels
    # too wide to unroll; this module keeps the lag form.)  The addition
    # chain and pow() constants are identical expression text on both
    # engines, so the doubles match before the final round.
    _lag_num = " + ".join(
        ["value"]
        + [
            f"coalesce(lag(value, {k}) OVER (PARTITION BY user_id "
            f"ORDER BY ts, event_id), 0) * pow(0.6, {k})"
            for k in range(1, 10)
        ]
    )
    _lag_den = " + ".join(
        ["1.0"]
        + [
            f"CASE WHEN lag(value, {k}) OVER (PARTITION BY user_id "
            f"ORDER BY ts, event_id) IS NOT NULL THEN pow(0.6, {k}) "
            f"ELSE 0 END"
            for k in range(1, 10)
        ]
    )
    both(
        "ts_ewma",
        f"""
        SELECT user_id,
               CAST(row_number() OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                 AS rn,
               CAST(round(({_lag_num}) / ({_lag_den}), 4) AS DOUBLE)
                 AS ewma10
        FROM {{events}}
        WHERE user_id < 30
        ORDER BY user_id, rn
        """,
    )

    # OHLC bars: per (series, day) open/high/low/close via the argmin/
    # argmax aggregates — one partial→final hash agg, no window, no
    # self-join.  Event timestamps are unique per bar in the testdata
    # (asserted in tests/test_analytics.py for the min_max_by family),
    # so argmin/argmax need no composite tiebreak.
    both(
        "ts_ohlc_bars",
        """
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS bar,
               CAST(round(min_by(value, ts), 4) AS DOUBLE) AS open,
               CAST(round(max(value), 4) AS DOUBLE) AS high,
               CAST(round(min(value), 4) AS DOUBLE) AS low,
               CAST(round(max_by(value, ts), 4) AS DOUBLE) AS close,
               CAST(round(avg(value), 4) AS DOUBLE) AS mean_px,
               CAST(count(*) AS BIGINT) AS n_events
        FROM {events}
        GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
        ORDER BY event_type, bar
        """,
        """
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS bar,
               CAST(round(arg_min(value, ts), 4) AS DOUBLE) AS open,
               CAST(round(max(value), 4) AS DOUBLE) AS high,
               CAST(round(min(value), 4) AS DOUBLE) AS low,
               CAST(round(arg_max(value, ts), 4) AS DOUBLE) AS close,
               CAST(round(avg(value), 4) AS DOUBLE) AS mean_px,
               CAST(count(*) AS BIGINT) AS n_events
        FROM {events}
        GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
        ORDER BY event_type, bar
        """,
    )


_register_sql_entries()


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


def _register_interp_entry() -> None:
    """Linear-interpolation resampling: the interpolating sibling of
    ts_gap_fill's forward fill.  Same grid construction; empty buckets
    get last-before and first-after observations from two windows over
    the SAME (key, bucket) ordering (one exchange, two frame scans),
    then lerp on the bucket index distance.  Doubles are derived from
    exact bucket-index integers and raw observation values with
    identical expression text — deterministic, no rounding.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
    WITH e AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, ts, event_id, value
      FROM {events} WHERE user_id < 20
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
    b AS (
      SELECT user_id, min(bucket) AS h0, max(bucket) AS h1 FROM e
      GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             {explode} AS bucket
      FROM b
    ),
    g AS (
      SELECT g.user_id, g.bucket, l.value AS obs,
             row_number() OVER (
               PARTITION BY g.user_id ORDER BY g.bucket) AS idx
      FROM grid g
      LEFT JOIN last_in_bucket l
        ON g.user_id = l.user_id AND g.bucket = l.bucket
    ),
    f AS (
      SELECT user_id, bucket, obs, idx,
             {lastnn}(obs{innn}) {outnn} OVER (
               PARTITION BY user_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             {lastnn}(CASE WHEN obs IS NOT NULL THEN idx END{innn}) {outnn}
               OVER (
               PARTITION BY user_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_i,
             {firstnn}(obs{innn}) {outnn} OVER (
               PARTITION BY user_id ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             {firstnn}(CASE WHEN obs IS NOT NULL THEN idx END{innn}) {outnn}
               OVER (
               PARTITION BY user_id ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_i
      FROM g
    )
    SELECT user_id, bucket,
           CAST(obs IS NOT NULL AS BOOLEAN) AS observed,
           CASE
             WHEN obs IS NOT NULL THEN obs
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               prev_v + (next_v - prev_v) * (idx - prev_i)
                 / (next_i - prev_i)
             ELSE coalesce(prev_v, next_v)
           END AS interp_value
    FROM f
    ORDER BY user_id, bucket
    """
    # IGNORE NULLS placement differs: Spark takes it after the call,
    # DuckDB inside the argument list.
    spark_sql = tpl.format(
        events=_SPARK_TABLES["events"],
        explode="explode(sequence(h0, h1, INTERVAL 1 HOUR))",
        lastnn="last_value", firstnn="first_value",
        innn="", outnn="IGNORE NULLS",
    )
    oracle_sql = tpl.format(
        events=_ORACLE_TABLES["events"],
        explode="unnest(generate_series(h0, h1, INTERVAL 1 HOUR))",
        lastnn="last_value", firstnn="first_value",
        innn=" IGNORE NULLS", outnn="",
    )
    register_sql("ts_interp_fill", spark_sql, oracle_sql)


_register_interp_entry()


def _register_seasonal_decompose() -> None:
    """Classical additive seasonal decomposition of the daily value
    series: trend = centered 7-day moving
    average over a VALUE-based RANGE frame on the epoch day (calendar
    gaps shrink the window instead of silently pulling in non-adjacent
    days as a ROWS frame would), seasonal = mean
    detrended value per day-of-week, residual = the rest.

    Scale shape: the ONLY full-data pass is the per-day aggregation
    (map-side combinable, one shuffle); every window after it runs over
    the DAILY frame, which is calendar-bounded (36,500 rows per century)
    — a global ORDER BY ed window over that frame is metadata-scale
    whatever the event volume, the same argument as ts_gap_fill's grid.
    Day-of-week is computed as ed % 7 (epoch-day modulo — identical
    integers on both engines; dayofweek() numbering differs between
    them).  Determinism: daily sums and the seasonal numerator are
    exact DECIMAL; trend/seasonal divisions run the identical double
    expression on identical operands; every emitted float is
    round(.., 6) of a deterministic double (the ts_zscore discipline).
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
    WITH daily AS (
      SELECT {epoch_day} AS ed,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS v
      FROM {events}
      GROUP BY 1, 2
    ),
    tr AS (
      SELECT ed, day, v,
             CAST(sum(v) OVER (ORDER BY ed
               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS DECIMAL(38,6)) AS s7,
             count(*) OVER (ORDER BY ed
               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
      FROM daily
    ),
    de AS (
      SELECT ed, day, v,
             round(CAST(s7 AS DOUBLE) / n7, 6) AS trend,
             CAST(round(CAST(v AS DOUBLE)
                        - round(CAST(s7 AS DOUBLE) / n7, 6), 6)
               AS DECIMAL(28,6)) AS detr
      FROM tr
    ),
    se AS (
      SELECT ed, day, v, trend, detr,
             CAST(sum(detr) OVER (PARTITION BY ed % 7) AS DOUBLE)
               / count(*) OVER (PARTITION BY ed % 7) AS seas_raw
      FROM de
    )
    SELECT day, CAST(v AS DOUBLE) AS v, trend,
           round(seas_raw, 6) AS seasonal,
           round(CAST(detr AS DOUBLE) - round(seas_raw, 6), 6) AS residual
    FROM se
    ORDER BY day
    """
    register_sql(
        "ts_seasonal_decompose",
        tpl.replace(
            "{epoch_day}",
            "datediff(CAST(date_trunc('day', ts) AS DATE),"
            " DATE '1970-01-01')",
        ).format(**_SPARK_TABLES),
        tpl.replace(
            "{epoch_day}",
            "datediff('day', DATE '1970-01-01',"
            " CAST(date_trunc('day', ts) AS DATE))",
        ).format(**_ORACLE_TABLES),
    )


_register_seasonal_decompose()


def _register_autocorr_cusum() -> None:
    """Autocorrelation function and CUSUM changepoint over the daily
    value series.

    - ``ts_autocorrelation``: ACF at lags 1..7 as corr(x_t, x_{t-lag})
      via a TIME-SHIFT self-join on epoch day (b.ed = a.ed - lag): a
      true calendar lag, well-defined under gaps — not a row-offset
      window, which silently mis-lags across missing days.  The daily
      frame is tiny (one row per day) so the 7-way lag expansion is a
      broadcast-scale join; the heavy lifting (the event scan + daily
      rollup) happens ONCE.  corr inputs are exact DECIMAL daily sums
      cast to DOUBLE, result rounded to 4 (the op_stats_regression
      discipline: moment sums are partition-order-sensitive in the
      last ulps).
    - ``ts_cusum_changepoint``: the classic mean-shift detector.  The
      deviation statistic is computed in EXACT INTEGER micro-units
      (graph.py's fixed-point PageRank discipline): with P_t the prefix
      sum and T the total, D_t = n*P_t - t*T equals n * CUSUM_t and its
      argmax is partition-order-independent, so the top-5 selection is
      bit-deterministic on both engines.  BIGINT bounds: |D| <= n * T
      ~ 1e17 at sf0.1 micro-units; at 1000x move the same plan to
      DECIMAL(38,0) columns.  One event scan, one daily rollup
      (map-side combinable), one single-partition window over the
      narrow DAILY frame (one row/day — bounded by calendar span, not
      data volume).
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    daily_cte = """
    daily AS (
      SELECT {epoch_day} AS ed,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6))
                  * 1000000 AS BIGINT) AS vu
      FROM {events}
      GROUP BY 1, 2
    )"""

    acf_tpl = (
        "WITH "
        + daily_cte
        + """
    SELECT lags.lg AS lag_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(round(corr(CAST(a.vu AS DOUBLE), CAST(b.vu AS DOUBLE)), 4)
                AS DOUBLE) AS acf
    FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) lags(lg)
    CROSS JOIN daily a
    JOIN daily b ON b.ed = a.ed - lags.lg
    GROUP BY lags.lg
    ORDER BY lags.lg
    """
    )

    cusum_tpl = (
        "WITH "
        + daily_cte
        + """,
    tot AS (
      SELECT CAST(sum(vu) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n
      FROM daily
    ),
    pre AS (
      SELECT ed, day, vu,
             CAST(sum(vu) OVER (ORDER BY ed) AS BIGINT) AS prefix,
             CAST(row_number() OVER (ORDER BY ed) AS BIGINT) AS t
      FROM daily
    ),
    dev AS (
      SELECT p.day, p.t, tt.n,
             CAST(tt.n * p.prefix - p.t * tt.total AS BIGINT) AS d
      FROM pre p CROSS JOIN tot tt
    )
    SELECT CAST(row_number() OVER (ORDER BY abs(d) DESC, day) AS INT) AS rank,
           day,
           CAST(round(CAST(d AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000), 2)
                AS DOUBLE) AS cusum,
           CAST(CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 ELSE 0 END AS INT)
             AS direction
    FROM dev
    ORDER BY abs(d) DESC, day
    LIMIT 5
    """
    )

    spark_epoch = (
        "datediff(CAST(date_trunc('day', ts) AS DATE), DATE '1970-01-01')"
    )
    duck_epoch = (
        "datediff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE))"
    )
    for name, tpl in (
        ("ts_autocorrelation", acf_tpl),
        ("ts_cusum_changepoint", cusum_tpl),
    ):
        register_sql(
            name,
            tpl.replace("{epoch_day}", spark_epoch).format(**_SPARK_TABLES),
            tpl.replace("{epoch_day}", duck_epoch).format(**_ORACLE_TABLES),
        )


_register_autocorr_cusum()


def _register_mom_yoy() -> None:
    """Month-over-month and year-over-year revenue change — the BI
    staple every reference user runs daily.

    One fact scan → monthly cents (exact BIGINT), then two lag windows
    over the tiny month frame: MoM against the previous calendar month
    in the frame, YoY against the month 12 rows back ONLY when it is
    exactly the same month last year (a gap in the series must yield
    NULL, not a mis-aligned comparison — the row-offset-vs-calendar
    trap the ACF entry also avoids).  Percentages are per-row IEEE on
    exact integers, rounded.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
    WITH monthly AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mix,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS cents
      FROM {orders}
      GROUP BY 1, 2, 3
    ),
    lagged AS (
      SELECT yr, mo, mix, cents,
             lag(cents) OVER (ORDER BY mix) AS prev_cents,
             lag(mix) OVER (ORDER BY mix) AS prev_mix,
             lag(cents, 12) OVER (ORDER BY mix) AS yoy_cents,
             lag(mix, 12) OVER (ORDER BY mix) AS yoy_mix
      FROM monthly
    )
    SELECT yr, mo,
           cents AS revenue_cents,
           CASE WHEN prev_mix = mix - 1 THEN
             round((CAST(cents AS DOUBLE) / prev_cents - 1) * 100, 2)
           END AS mom_pct,
           CASE WHEN yoy_mix = mix - 12 THEN
             round((CAST(cents AS DOUBLE) / yoy_cents - 1) * 100, 2)
           END AS yoy_pct
    FROM lagged
    ORDER BY yr, mo
    """
    register_sql(
        "ts_mom_yoy_change",
        tpl.format(**_SPARK_TABLES),
        tpl.format(**_ORACLE_TABLES),
    )


_register_mom_yoy()


def _register_mann_kendall() -> None:
    """Mann-Kendall trend test per nation over the monthly revenue
    series — the standard nonparametric "is this series trending?"
    statistic (Mann 1945; Kendall 1975), fully relational and exact.

    S = sum over month pairs i<j of sign(x_j - x_i), computed by a
    within-key self-join of the tiny monthly frame (n months per key,
    n(n-1)/2 bounded pairs — at 100 TB the fact scan dominates and the
    pair join stays metadata-scale because it runs on the aggregated
    series, never the facts; per-key cost is fixed by series length,
    not corpus size).  Monthly revenue is exact integer cents, so
    sign() decisions are exact; S, n and the variance numerator
    n(n-1)(2n+5) are exact BIGINTs; only the final z (continuity-
    corrected, variance /18) is a per-row IEEE expression over those
    exact integers, identical text on both engines.  n_months rides
    along via a count window over the monthly frame instead of a third
    scan branch (Spark inlines CTEs: a separate count branch would
    re-derive the 3-table join lineage).
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
    WITH monthly AS (
      SELECT n_name,
             (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mix,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS cents,
             CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS pre_n
      FROM {orders}
      JOIN {customer} ON o_custkey = c_custkey
      JOIN {nation} ON c_nationkey = n_nationkey
      GROUP BY n_name, (year(o_orderdate) * 12 + month(o_orderdate) - 1)
    ),
    stats AS (
      SELECT a.n_name AS nation,
             CAST(max(a.pre_n) AS BIGINT) AS n_months,
             CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM monthly a
      JOIN monthly b ON a.n_name = b.n_name AND a.mix < b.mix
      GROUP BY a.n_name
    )
    SELECT nation, n_months, s_stat,
           n_months * (n_months - 1) * (2 * n_months + 5) AS var18_num,
           (CAST(s_stat AS DOUBLE)
              - (CASE WHEN s_stat > 0 THEN 1
                      WHEN s_stat < 0 THEN -1 ELSE 0 END))
             / sqrt(CAST(n_months * (n_months - 1) * (2 * n_months + 5)
                         AS DOUBLE) / 18) AS z_mk
    FROM stats
    ORDER BY nation
    """
    register_sql(
        "ts_mann_kendall",
        tpl.format(**_SPARK_TABLES),
        tpl.format(**_ORACLE_TABLES),
    )


_register_mann_kendall()


def _register_theil_sen() -> None:
    """Theil–Sen robust trend slope over the global monthly-revenue
    series — the median of all pairwise slopes (Theil 1950; Sen 1968),
    the estimator that pairs with ts_mann_kendall's trend *test*: MK
    says WHETHER the series trends, Theil–Sen says HOW FAST, robust to
    ~29% outlier contamination where OLS is robust to none.

    Exactness: monthly revenue is exact integer cents, so each pairwise
    slope (c_j - c_i) / (j - i) is ONE per-row IEEE division of exact
    integers — correctly rounded, bit-identical on both engines — and
    the median is DISCRETE (the lo/hi middle elements under a total
    order on (slope, i, j), the op_runs_test idiom), so no float ever
    feeds a keep decision or an aggregate sum.  Reported as slope_lo /
    slope_hi (equal when the pair count is odd).

    Scale: the pair self-join and the ranking window run on the
    AGGREGATED month frame (~84 rows -> ~3.5k pairs at any corpus
    size) — the fact scan is the only corpus term, the ts_mann_kendall
    economics exactly.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
    WITH monthly AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mix,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS cents
      FROM {orders}
      GROUP BY (year(o_orderdate) * 12 + month(o_orderdate) - 1)
    ),
    pairs AS (
      SELECT a.mix AS i, b.mix AS j,
             CAST(b.cents - a.cents AS DOUBLE)
               / CAST(b.mix - a.mix AS DOUBLE) AS slope
      FROM monthly a JOIN monthly b ON a.mix < b.mix
    ),
    ranked AS (
      SELECT slope,
             row_number() OVER (ORDER BY slope, i, j) AS rn,
             count(*) OVER () AS n
      FROM pairs
    )
    SELECT CAST(max(n) AS BIGINT) AS n_pairs,
           max(CASE WHEN 2 * rn <= n + 1 THEN slope END) AS slope_lo,
           min(CASE WHEN 2 * rn >= n + 1 THEN slope END) AS slope_hi
    FROM ranked
    """
    register_sql(
        "ts_theil_sen",
        tpl.format(**_SPARK_TABLES),
        tpl.format(**_ORACLE_TABLES),
    )


_register_theil_sen()


def _register_rolling_corr() -> None:
    """Trailing-28-day Pearson correlation between daily revenue and
    daily shipped quantity, per return flag — the rolling co-movement
    diagnostic (do high-volume days stay high-value?) every BI stack
    layers on a window function.

    Exactness discipline: the five moment components (sum x, sum y,
    sum xy, sum x^2, sum y^2) are summed in the calendar RANGE window
    as DECIMAL — per-day values are DECIMAL(18,0) integers (cents /
    integer units), so products are DECIMAL(37,0) and the windowed sums
    stay exact far beyond the x30 replica scale (28-day revenue-squared
    sums reach ~1e21; DECIMAL 38 holds 1e38).  A float sum inside the
    window would be partition-order-sensitive across engines; exact
    decimals make the moments bit-identical, and the final correlation
    is one per-row IEEE expression over them (identical text both
    engines).  Zero-variance windows yield NULL via an exact
    denominator-zero guard.

    Scale: one fact scan → per-(flag, day) aggregate (map-side
    combinable; the window then runs over ~days x flags rows, not
    facts).  The RANGE frame is over an exact epoch-day integer — the
    same portable idiom as op_rolling_revenue_28d.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
    WITH daily AS (
      SELECT l_returnflag AS flag,
             CAST(l_shipdate AS DATE) AS d,
             {epoch_day} AS ed,
             CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  AS DECIMAL(18,0)) AS DECIMAL(18,0)) AS x,
             CAST(CAST(sum(CAST(round(l_quantity, 0) AS BIGINT))
                  AS DECIMAL(18,0)) AS DECIMAL(18,0)) AS y
      FROM {lineitem}
      GROUP BY l_returnflag, CAST(l_shipdate AS DATE), {epoch_day}
    ),
    moments AS (
      SELECT flag, d,
             CAST(count(*) OVER w AS BIGINT) AS n_days,
             sum(x) OVER w AS sx,
             sum(y) OVER w AS sy,
             sum(x * y) OVER w AS sxy,
             sum(x * x) OVER w AS sxx,
             sum(y * y) OVER w AS syy
      FROM daily
      WINDOW w AS (PARTITION BY flag ORDER BY ed
                   RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT flag, d, n_days,
           CAST(sx AS BIGINT) AS rev_cents_28d,
           CAST(sy AS BIGINT) AS qty_28d,
           CASE WHEN (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
                  OR (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0
                THEN NULL
                ELSE (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (sqrt(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END AS corr_28d
    FROM moments
    ORDER BY flag, d
    """
    spark_sql = tpl.replace(
        "{epoch_day}", "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')"
    ).format(**_SPARK_TABLES)
    oracle_sql = tpl.replace(
        "{epoch_day}",
        "datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))",
    ).format(**_ORACLE_TABLES)
    register_sql("ts_rolling_corr", spark_sql, oracle_sql)


_register_rolling_corr()


def _register_kendall_tau() -> None:
    """Kendall tau-b rank correlation between monthly revenue and
    monthly shipped quantity — the nonparametric co-movement measure
    that completes the rank-statistics family (ts_mann_kendall is
    exactly Kendall tau of the series against time; ts_theil_sen is its
    slope estimator).

    Tau-b handles ties exactly: concordant/discordant/tie counts are
    exact BIGINTs from the pairwise sign comparison — sign(drev) *
    sign(dqty), never the raw delta product, so two large monthly
    deltas can't overflow int64 (where Spark non-ANSI wraps silently
    while DuckDB errors) — and tau =
    (C - D) / sqrt((n0-n1)*(n0-n2)) is one per-row IEEE expression over
    those integers (sqrt is correctly rounded).  The tie corrections
    n1/n2 come from the SAME pair join (a pair with equal x IS one of
    the sum t(t-1)/2 tied pairs) — separate per-value GROUP BY branches
    would re-derive the monthly aggregation per consumer under Spark's
    CTE inlining (census measured 4 fact scans; this form holds at the
    self-join's 2).  The pair join runs on the AGGREGATED month frame
    (~84 rows, ~3.5k pairs at any corpus size) — the fact scan is the
    only corpus term.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
    WITH monthly AS (
      SELECT (year(l_shipdate) * 12 + month(l_shipdate) - 1) AS mix,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS rev,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM {lineitem}
      GROUP BY (year(l_shipdate) * 12 + month(l_shipdate) - 1)
    ),
    pairs AS (
      SELECT CAST(sum(CASE WHEN sign(b.rev - a.rev) * sign(b.qty - a.qty) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN sign(b.rev - a.rev) * sign(b.qty - a.qty) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(sum(CASE WHEN b.rev = a.rev THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(sum(CASE WHEN b.qty = a.qty THEN 1 ELSE 0 END)
               AS BIGINT) AS n2,
             CAST(count(*) AS BIGINT) AS n0
      FROM monthly a JOIN monthly b ON a.mix < b.mix
    )
    SELECT c AS concordant, d AS discordant, n0 AS n_pairs, n1 AS ties_x,
           n2 AS ties_y,
           (CAST(c AS DOUBLE) - CAST(d AS DOUBLE))
             / sqrt((CAST(n0 AS DOUBLE) - n1) * (CAST(n0 AS DOUBLE) - n2))
             AS tau_b
    FROM pairs
    """
    register_sql(
        "ts_kendall_tau",
        tpl.format(**_SPARK_TABLES),
        tpl.format(**_ORACLE_TABLES),
    )


_register_kendall_tau()


def _register_hampel_filter() -> None:
    """Hampel filter (Hampel 1974; the standard robust time-series
    despiking method): per key, an 11-row CENTERED window's median and
    MAD (median absolute deviation from that median), flagging points
    with |x - med| > 3 * MAD.  Median/MAD beat the z-score pack's
    mean/sigma exactly where despiking matters — a spike inflates the
    mean AND the stddev, masking itself; the median and MAD ignore it.

    Determinism: values fold to cents (BIGINT) at the scan, so median =
    element 5 of the sorted 11-array and MAD = element 5 of the sorted
    absolute-deviation array are pure integer selections — no float
    order sensitivity anywhere.  The 3*MAD threshold is the classic
    Pearson rule on the raw MAD (the 1.4826 Gaussian consistency factor
    folded in: 3*MAD ~ 2.02 sigma for normal data).

    100 TB shape: one hash shuffle on the key; the window frame is
    ROWS-bounded (11 elements), so executor state is O(frame) per row
    regardless of partition size — the sorted-list trick is safe
    exactly because the frame is a small constant (it would be wrong
    for an unbounded frame).  Full windows only (warm-up/cool-down
    edges dropped).  Entry bounded to a key slice for a constant-size
    graded result; the shape is key-count-invariant.

    Spark and DuckDB templates differ only in list dialect: sort_array/
    collect_list/transform + 0-based indexing vs list_sort/list/
    comprehension + 1-based indexing.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    spark_tpl = """
        WITH w AS (
          SELECT user_id, ts, event_id,
                 CAST(round(value * 100, 0) AS BIGINT) AS v_cents,
                 sort_array(collect_list(
                   CAST(round(value * 100, 0) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)) AS win
          FROM {events}
          WHERE user_id < 30
        ),
        m AS (
          SELECT user_id, ts, event_id, v_cents,
                 win[5] AS med_cents,
                 array_sort(transform(win, x -> abs(x - win[5])))[5]
                   AS mad_cents
          FROM w
          WHERE size(win) = 11
        )
        SELECT user_id, ts, event_id, v_cents, med_cents, mad_cents,
               CAST(abs(v_cents - med_cents) > 3 * mad_cents AS BOOLEAN)
                 AS is_outlier
        FROM m
        ORDER BY user_id, ts, event_id
    """
    oracle_tpl = """
        WITH w AS (
          SELECT user_id, ts, event_id,
                 CAST(round(value * 100, 0) AS BIGINT) AS v_cents,
                 list_sort(list(
                   CAST(round(value * 100, 0) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)) AS win
          FROM {events}
          WHERE user_id < 30
        ),
        m AS (
          SELECT user_id, ts, event_id, v_cents,
                 win[6] AS med_cents,
                 list_sort([abs(x - win[6]) for x in win])[6] AS mad_cents
          FROM w
          WHERE len(win) = 11
        )
        SELECT user_id, ts, event_id, v_cents, med_cents, mad_cents,
               CAST(abs(v_cents - med_cents) > 3 * mad_cents AS BOOLEAN)
                 AS is_outlier
        FROM m
        ORDER BY user_id, ts, event_id
    """
    register_sql(
        "ts_hampel_filter",
        spark_tpl.format(**_SPARK_TABLES),
        oracle_tpl.format(**_ORACLE_TABLES),
    )


_register_hampel_filter()


def _register_sax() -> None:
    """SAX symbolization (Lin, Keogh, Wei, Lonardi 2003/2007 —
    "Experiencing SAX"): each per-user value series is z-normalized,
    reduced by Piecewise Aggregate Approximation (8 equal segments, the
    mean per segment) and each segment mean mapped to a 4-letter
    alphabet via the standard N(0,1) breakpoints (-0.6745, 0, 0.6745 —
    the Gaussian quartiles from the published breakpoint table), giving
    one 8-character word per series — the representation behind
    SAX-family motif discovery, discord detection and series indexing.

    Determinism layering (the zscore-idiom discipline): every
    accumulated quantity is EXACT — per-segment sums in cents (BIGINT),
    per-series moments as DECIMAL sums — and the ONLY float arithmetic
    is one per-row expression (segment mean, series mean/sigma, one
    subtraction/division chain) evaluated identically on both engines
    from identical integers, so the CASE comparisons against the
    breakpoint literals land on the same branch everywhere.  PAA
    segment ids come from integer division of the per-series row index
    ((idx-1)*8 div n), so segment assignment is float-free.

    100 TB shape: ONE event scan — the per-series z-moments are
    re-aggregated FROM the 8-rows-per-series segment frame (each
    segment carries its exact square sum), not from a second pass over
    base (Spark inlines CTEs, so a mom-from-base formulation scans the
    event log twice).  One hash shuffle on the key, a per-key ROWS
    window for the index (partition bounded by series length), one
    keyed agg to 8 rows per series, per-series z-moment totals as
    whole-partition window sums over that 8-row frame (so seg has ONE
    consumer — a mom-CTE self-join would inline seg twice under Spark),
    and a final per-series collect of 8 structs.  Series shorter than 8
    points are dropped (PAA needs >= 1 point per segment).
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    common = """
        WITH base AS (
          SELECT user_id,
                 CAST(round(value * 100, 0) AS BIGINT) AS v_cents,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS idx,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM {events}
          WHERE user_id < 30
        ),
        seg AS (
          SELECT user_id, n,
                 CAST(((idx - 1) * 8) {div} n AS BIGINT) AS seg_id,
                 CAST(sum(v_cents) AS BIGINT) AS s_cents,
                 CAST(sum(CAST(v_cents AS DECIMAL(18, 0))
                          * CAST(v_cents AS DECIMAL(18, 0)))
                   AS DECIMAL(38, 0)) AS ssq,
                 CAST(count(*) AS BIGINT) AS c
          FROM base
          WHERE n >= 8
          GROUP BY user_id, n, CAST(((idx - 1) * 8) {div} n AS BIGINT)
        ),
        sym AS (
          SELECT user_id, seg_id,
                 CASE WHEN z < -0.6745 THEN 'a'
                      WHEN z < 0.0 THEN 'b'
                      WHEN z < 0.6745 THEN 'c'
                      ELSE 'd' END AS symbol
          FROM (
            SELECT user_id, seg_id,
                   (CAST(s_cents AS DOUBLE) / c - sxd / nn)
                   / sqrt(greatest((sxxd - sxd * sxd / nn) / nn,
                                   0.000001)) AS z
            FROM (
              SELECT user_id, seg_id, s_cents, c,
                     CAST(CAST(sum(s_cents) OVER
                          (PARTITION BY user_id) AS DECIMAL(38, 0))
                       AS DOUBLE) AS sxd,
                     CAST(sum(ssq) OVER (PARTITION BY user_id)
                       AS DOUBLE) AS sxxd,
                     CAST(sum(c) OVER (PARTITION BY user_id)
                       AS DOUBLE) AS nn
              FROM seg
            ) t
          ) z
        )
        SELECT user_id,
               {word_expr} AS sax_word,
               CAST(count(*) AS BIGINT) AS n_segs
        FROM sym
        GROUP BY user_id
        ORDER BY user_id
    """
    spark_tpl = common.replace("{div}", "div").replace(
        "{word_expr}",
        "array_join(transform(array_sort(collect_list("
        "struct(seg_id, symbol))), x -> x.symbol), '')",
    )
    oracle_tpl = common.replace("{div}", "//").replace(
        "{word_expr}", "string_agg(symbol, '' ORDER BY seg_id)"
    )
    register_sql(
        "ts_sax_words",
        spark_tpl.format(**_SPARK_TABLES),
        oracle_tpl.format(**_ORACLE_TABLES),
    )


_register_sax()


def _register_mase_eval() -> None:
    """Forecast backtest with MASE (Hyndman & Koehler 2006, "Another
    look at measures of forecast accuracy"): per event-type daily
    revenue series, one-step NAIVE (v[t-1]) and SEASONAL-NAIVE (v[t-7])
    forecasts are evaluated against each other's scaling — snaive's MAE
    scaled by naive's answers "is the weekly cycle worth modeling?"
    (mase < 1e6 ppm means yes), and naive scaled by snaive answers the
    converse.  The standard pre-modeling artifact before fitting
    anything heavier.

    Determinism: the series is exact daily cents, errors are integer
    absolute differences, and MASE is ONE integer cross-multiplied
    floor division in ppm — (sum_err_a * n_b * 1e6) div (sum_err_b *
    n_a) — no float anywhere (the op_assoc_rules ppm idiom).  Each
    forecast only scores days where BOTH lags exist, so the two error
    sets are aligned and n_a = n_b by construction (kept as separate
    counts in the output for auditability).

    The lags are CALENDAR-exact, not row-offset: each day is mapped to
    an integer day number and v[t-1]/v[t-7] are singleton
    ``RANGE BETWEEN k PRECEDING AND k PRECEDING`` window frames over
    that number, so a series with a missing day compares each day
    against the true same-weekday value (NULL — excluded from scoring
    — when the calendar day is absent), never the 7th prior *observed*
    day.  No gap-fill scan, no self-join: RANGE frames keep it one
    window pass, identical in both engines.

    100 TB shape: one scan to the (type, day) daily frame (map-side
    combinable; the wide event payload never shuffles), two range
    windows per tiny per-type partition (~30 rows per series here,
    ~years of days in production — still thousands, never
    corpus-scale), one 5-row aggregate.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    # {dnum}: integer days since a fixed epoch — Spark datediff() is
    # 2-arg (end, start); DuckDB date subtraction yields integer days.
    tpl = """
        WITH daily AS (
          SELECT event_type,
                 {dnum} AS dn,
                 CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                   AS BIGINT) AS v
          FROM {events}
          GROUP BY event_type, {dnum}
        ),
        lagged AS (
          SELECT event_type, dn, v,
                 max(v) OVER (PARTITION BY event_type ORDER BY dn
                   RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS v1,
                 max(v) OVER (PARTITION BY event_type ORDER BY dn
                   RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS v7
          FROM daily
        ),
        err AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(abs(v - v1)) AS BIGINT) AS err_naive,
                 CAST(sum(abs(v - v7)) AS BIGINT) AS err_snaive
          FROM lagged
          WHERE v1 IS NOT NULL AND v7 IS NOT NULL
          GROUP BY event_type
        )
        SELECT event_type, n_days, err_naive, err_snaive,
               CAST((err_snaive * 1000000) {div} greatest(err_naive, 1)
                 AS BIGINT) AS mase_snaive_ppm,
               CAST((err_naive * 1000000) {div} greatest(err_snaive, 1)
                 AS BIGINT) AS mase_naive_ppm
        FROM err
        ORDER BY event_type
    """
    register_sql(
        "ts_mase_eval",
        tpl.replace("{div}", "div")
        .replace("{dnum}",
                 "CAST(datediff(CAST(date_trunc('day', ts) AS DATE),"
                 " DATE '1992-01-01') AS BIGINT)")
        .format(**_SPARK_TABLES),
        tpl.replace("{div}", "//")
        .replace("{dnum}",
                 "CAST(CAST(date_trunc('day', ts) AS DATE)"
                 " - DATE '1992-01-01' AS BIGINT)")
        .format(**_ORACLE_TABLES),
    )


_register_mase_eval()


def _register_spc_rules() -> None:
    """Western Electric SPC control-chart rules (Western Electric
    Statistical Quality Control Handbook 1956; the standard
    anomaly-triage layer over any metric series): per event-type daily
    revenue, flag each day under the four classic zone rules —

      R1: the point is beyond 3 sigma;
      R2: 2 of the last 3 points beyond 2 sigma on the SAME side;
      R3: 4 of the last 5 points beyond 1 sigma on the same side;
      R4: 8 consecutive points on one side of the center line.

    ALL-INTEGER sigma tests — no sqrt, no float: with per-type count n,
    sum S and sum-of-squares Q over exact daily cents,

      |x - mu| > k*sigma  <=>  (x*n - S)^2 > k^2 * (n*Q - S^2),

    both sides held in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) since
    dev^2 reaches ~1e21 at realistic cents.  Side = sign(x*n - S).
    Rule windows are plain ROWS frames over observed days per type —
    SPC operates on consecutive SAMPLES, so row offsets are the
    textbook semantics (unlike ts_mase_eval's calendar lags).

    100 TB shape: one events scan to the (type, day) frame (map-side
    combinable), per-type totals as whole-partition window aggregates over the
    tiny daily frame (no stats self-join — the CTE-inlining trap would
    scan events twice), four ROWS windows per tiny per-type partition.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
        WITH daily AS (
          SELECT event_type, {dnum} AS dn,
                 CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                   AS BIGINT) AS v
          FROM {events}
          GROUP BY event_type, {dnum}
        ),
        totals AS (
          SELECT event_type, dn, v,
                 CAST(count(*) OVER wt AS BIGINT) AS n,
                 CAST(sum(v) OVER wt AS BIGINT) AS s,
                 CAST(sum(CAST(v AS {big}) * v) OVER wt AS {big}) AS q
          FROM daily
          WINDOW wt AS (PARTITION BY event_type)
        ),
        dev AS (
          SELECT event_type, dn, v,
                 CAST(v AS {big}) * n - s AS dv,
                 n * q - CAST(s AS {big}) * s AS nvar
          FROM totals
        ),
        zones AS (
          SELECT event_type, dn, v,
                 CASE WHEN dv > 0 THEN 1 WHEN dv < 0 THEN -1 ELSE 0 END
                   AS side,
                 CASE WHEN dv * dv > 9 * nvar THEN 1 ELSE 0 END AS z3,
                 CASE WHEN dv * dv > 4 * nvar THEN 1 ELSE 0 END AS z2,
                 CASE WHEN dv * dv > 1 * nvar THEN 1 ELSE 0 END AS z1
          FROM dev
        ),
        flagged AS (
          SELECT event_type, dn, v, side,
                 z3 = 1 AS r1_beyond_3s,
                 (sum(CASE WHEN z2 = 1 AND side = 1 THEN 1 ELSE 0 END)
                    OVER w3 >= 2
                  OR sum(CASE WHEN z2 = 1 AND side = -1 THEN 1 ELSE 0 END)
                    OVER w3 >= 2) AS r2_two_of_three_2s,
                 (sum(CASE WHEN z1 = 1 AND side = 1 THEN 1 ELSE 0 END)
                    OVER w5 >= 4
                  OR sum(CASE WHEN z1 = 1 AND side = -1 THEN 1 ELSE 0 END)
                    OVER w5 >= 4) AS r3_four_of_five_1s,
                 (count(*) OVER w8 = 8
                  AND abs(sum(side) OVER w8) = 8) AS r4_eight_one_side
          FROM zones
          WINDOW
            w3 AS (PARTITION BY event_type ORDER BY dn
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
            w5 AS (PARTITION BY event_type ORDER BY dn
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
            w8 AS (PARTITION BY event_type ORDER BY dn
                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, dn, v, CAST(side AS INT) AS side,
               r1_beyond_3s, r2_two_of_three_2s, r3_four_of_five_1s,
               r4_eight_one_side
        FROM flagged
        WHERE r1_beyond_3s OR r2_two_of_three_2s OR r3_four_of_five_1s
           OR r4_eight_one_side
        ORDER BY event_type, dn
    """
    register_sql(
        "ts_spc_rules",
        tpl.replace("{big}", "DECIMAL(38,0)")
        .replace("{dnum}",
                 "CAST(datediff(CAST(date_trunc('day', ts) AS DATE),"
                 " DATE '1992-01-01') AS BIGINT)")
        .format(**_SPARK_TABLES),
        tpl.replace("{big}", "HUGEINT")
        .replace("{dnum}",
                 "CAST(CAST(date_trunc('day', ts) AS DATE)"
                 " - DATE '1992-01-01' AS BIGINT)")
        .format(**_ORACLE_TABLES),
    )


_register_spc_rules()


def _register_ordinal_patterns() -> None:
    """Ordinal-pattern histogram (Bandt & Pompe 2002, "Permutation
    Entropy: A Natural Complexity Measure for Time Series") — the fact
    table behind permutation entropy, ordinal-network analysis and
    series-complexity triage: per event-type daily revenue, every
    length-3 sliding window is mapped to its rank permutation and the
    per-type pattern distribution is reported in exact ppm.

    Ties broken by temporal order (the published convention: on equal
    values the EARLIER sample ranks lower), so with window (a, b, c) at
    positions (0, 1, 2):

      rank(a) = (b < a) + (c < a)
      rank(b) = (a <= b) + (c < b)
      rank(c) = (a <= c) + (b <= c)

    and the pattern code is the 3-digit decimal rank vector (012 =
    monotone up, 210 = monotone down, ...).  ALL-INTEGER: values fold
    to exact daily cents at the scan, ranks are comparison sums, shares
    are one nonnegative integer floor division (cnt * 1e6 div
    n_windows) — no float anywhere, so both engines agree bit-exactly.
    Permutation entropy itself needs ln and is deliberately left to the
    pytest layer (the HLL linear-counting precedent); the histogram IS
    the sufficient statistic.

    100 TB shape: one events scan to the (type, day) frame (map-side
    combinable), two lag references over one per-type ORDER BY dn
    window, a keyed histogram aggregation, and a per-type total as a
    whole-partition window over the <= 6-row pattern frame.  Matches
    the reference's query-over-facts surface (queries/*.sql aggregate
    shapes); complexity measurement itself is beyond-parity surface.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
        WITH daily AS (
          SELECT event_type, {dnum} AS dn,
                 CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                   AS BIGINT) AS v
          FROM {events}
          GROUP BY event_type, {dnum}
        ),
        lagged AS (
          SELECT event_type,
                 lag(v, 2) OVER w AS a,
                 lag(v, 1) OVER w AS b,
                 v AS c
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY dn)
        ),
        pat AS (
          SELECT event_type,
                 100 * ((CASE WHEN b < a THEN 1 ELSE 0 END)
                        + (CASE WHEN c < a THEN 1 ELSE 0 END))
                 + 10 * ((CASE WHEN a <= b THEN 1 ELSE 0 END)
                         + (CASE WHEN c < b THEN 1 ELSE 0 END))
                 + ((CASE WHEN a <= c THEN 1 ELSE 0 END)
                    + (CASE WHEN b <= c THEN 1 ELSE 0 END)) AS pattern
          FROM lagged
          WHERE a IS NOT NULL
        ),
        hist AS (
          SELECT event_type, pattern, CAST(count(*) AS BIGINT) AS cnt
          FROM pat
          GROUP BY event_type, pattern
        )
        SELECT event_type, CAST(pattern AS INT) AS pattern, cnt,
               CAST((cnt * 1000000) {fd}
                    sum(cnt) OVER (PARTITION BY event_type) AS BIGINT)
                 AS share_ppm,
               CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT)
                 AS n_windows
        FROM hist
        ORDER BY event_type, pattern
    """
    register_sql(
        "ts_ordinal_patterns",
        tpl.replace("{fd}", "div")
        .replace("{dnum}",
                 "CAST(datediff(CAST(date_trunc('day', ts) AS DATE),"
                 " DATE '1992-01-01') AS BIGINT)")
        .format(**_SPARK_TABLES),
        tpl.replace("{fd}", "//")
        .replace("{dnum}",
                 "CAST(CAST(date_trunc('day', ts) AS DATE)"
                 " - DATE '1992-01-01' AS BIGINT)")
        .format(**_ORACLE_TABLES),
    )


_register_ordinal_patterns()


def _register_max_drawdown() -> None:
    """Maximum drawdown + underwater profile (the standard risk/health
    measure for any monitored level series — Magdon-Ismail & Atiya 2004
    analyze its distribution): per event-type, over the DAILY REVENUE
    level series, each day's drawdown is

        dd_t = max_{s <= t}(v_s) - v_t        (exact cents)

    and the summary row reports the maximum drawdown, its trough day,
    the peak day it measures from, and the drawdown in ppm of that
    peak.  ALL-INTEGER: the running peak is a window MAX over cents;
    the peak DAY is recovered argmax-style by packing (v, -dn) into one
    BIGINT (v * 2^20 - dn, safe while dn < 2^20 and v < 2^43 cents —
    the winnowing packing precedent) so the EARLIEST day wins value
    ties, the textbook convention; the trough picks the max dd with the
    earliest day on ties via one more MAX over packed (dd, -dn); the
    ppm is one nonnegative floor division.

    100 TB shape: one events scan to the (type, day) frame (map-side
    combinable), two running-max window references per tiny per-type
    partition, one 5-row keyed aggregate.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
        WITH daily AS (
          SELECT event_type, {dnum} AS dn,
                 CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                   AS BIGINT) AS v
          FROM {events}
          GROUP BY event_type, {dnum}
        ),
        peaks AS (
          SELECT event_type, dn, v,
                 max(v) OVER w AS peak,
                 max(v * 1048576 - dn) OVER w AS peak_packed
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY dn
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        dd AS (
          SELECT event_type, dn, v, peak, peak_packed,
                 peak - v AS drawdown,
                 max((peak - v) * 1048576 - dn)
                   OVER (PARTITION BY event_type) AS best_packed
          FROM peaks
        )
        SELECT d.event_type,
               CAST(d.drawdown AS BIGINT) AS max_drawdown_cents,
               CAST(d.peak AS BIGINT) AS peak_cents,
               CAST(d.peak * 1048576 - d.peak_packed AS BIGINT) AS peak_dn,
               d.dn AS trough_dn,
               CAST(CASE WHEN d.peak > 0
                    THEN (d.drawdown * 1000000) {fd} d.peak
                    ELSE 0 END AS BIGINT) AS drawdown_ppm
        FROM dd d
        WHERE d.drawdown * 1048576 - d.dn = d.best_packed
        ORDER BY d.event_type
    """
    register_sql(
        "ts_max_drawdown",
        tpl.replace("{fd}", "div")
        .replace("{dnum}",
                 "CAST(datediff(CAST(date_trunc('day', ts) AS DATE),"
                 " DATE '1992-01-01') AS BIGINT)")
        .format(**_SPARK_TABLES),
        tpl.replace("{fd}", "//")
        .replace("{dnum}",
                 "CAST(CAST(date_trunc('day', ts) AS DATE)"
                 " - DATE '1992-01-01' AS BIGINT)")
        .format(**_ORACLE_TABLES),
    )


_register_max_drawdown()


def _register_pairwise_corr() -> None:
    """Cross-series Pearson correlation MATRIX over the per-event-type
    daily-count series — the "which metrics co-move" screening join
    every observability/feature store runs (ts_rolling_corr is the
    two-metric trailing window; this is all series pairs over the full
    aligned grid).

    Exactness discipline: series are aligned on the full day grid with
    explicit zero fill (types x days cross join, left join of counts —
    a missing day IS a zero observation for a count series, and
    dropping it would bias every pair differently), the five moment
    sums ride DECIMAL(38,0) (Spark) / HUGEINT (oracle — DuckDB's //
    on DECIMAL routes through DOUBLE, measured off-by-one at 1e25
    scale, while HUGEINT floor-divides the 1e36 intermediate exactly,
    matching Spark's exact DECIMAL div), and the result is the SIGN of
    the covariance plus r^2 in exact ppm by integer cross-multiplied
    floor division — no sqrt, no IEEE anywhere, so the matrix replays
    bit-identically.  Zero-variance series pair to NULL (the
    moments-profile discipline).

    100 TB shape: ONE fact scan into the materialized per-(type, day)
    aggregate (map-side combinable; the localCheckpoint pins the scan
    count at one — the SQL-CTE form re-derived the fact scan six times
    in Spark's plan), then a day-keyed self-join producing
    C(|types|, 2) x |days| rows.  For dashboards |types| is tens; the
    matrix frame stays metadata-scale while the scan does all the
    data-scale work once.
    """
    from dblab_ece_trino_spark.operators.registry import register
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dblab_ece_trino_spark.entrypoints import engine_for
        from dblab_ece_trino_spark.session import materialize

        ev = engine_for(spark, sf_dir).catalogs.table(
            "elastic.default.events"
        )
        daily = materialize(
            ev.groupBy(
                "event_type", F.col("ts").cast("date").alias("d")
            ).agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        types = daily.select("event_type").distinct()
        days = daily.select("d").distinct()
        grid = (
            types.crossJoin(days)
            .join(daily, ["event_type", "d"], "left")
            .select(
                "event_type",
                "d",
                F.coalesce("c", F.lit(0)).cast("decimal(18,0)").alias("c"),
            )
        )
        a, b = grid.alias("a"), grid.alias("b")
        pairs = (
            a.join(b, F.col("a.d") == F.col("b.d"))
            .filter(F.col("a.event_type") < F.col("b.event_type"))
            .groupBy(
                F.col("a.event_type").alias("type_a"),
                F.col("b.event_type").alias("type_b"),
            )
            .agg(
                F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
                F.sum("a.c").cast("decimal(38,0)").alias("sx"),
                F.sum("b.c").cast("decimal(38,0)").alias("sy"),
                F.sum(F.col("a.c") * F.col("b.c"))
                .cast("decimal(38,0)").alias("sxy"),
                F.sum(F.col("a.c") * F.col("a.c"))
                .cast("decimal(38,0)").alias("sxx"),
                F.sum(F.col("b.c") * F.col("b.c"))
                .cast("decimal(38,0)").alias("syy"),
            )
        )
        return pairs.selectExpr(
            "type_a",
            "type_b",
            "CAST(n AS BIGINT) AS n_days",
            "CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1"
            "          WHEN n * sxy - sx * sy < 0 THEN -1"
            "          ELSE 0 END AS INT) AS corr_sign",
            "CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0"
            "     THEN NULL"
            "     ELSE CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy)"
            "                * 1000000)"
            "               div ((n * sxx - sx * sx)"
            "                    * (n * syy - sy * sy)) AS BIGINT)"
            " END AS r2_ppm",
        ).orderBy("type_a", "type_b")

    oracle = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM {events}
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    grid AS (
      SELECT t.event_type, dd.d,
             CAST(coalesce(daily.c, 0) AS HUGEINT) AS c
      FROM (SELECT DISTINCT event_type FROM daily) t
      CROSS JOIN (SELECT DISTINCT d FROM daily) dd
      LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = dd.d
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(a.c) AS HUGEINT) AS sx,
             CAST(sum(b.c) AS HUGEINT) AS sy,
             CAST(sum(a.c * b.c) AS HUGEINT) AS sxy,
             CAST(sum(a.c * a.c) AS HUGEINT) AS sxx,
             CAST(sum(b.c * b.c) AS HUGEINT) AS syy
      FROM grid a JOIN grid b ON a.d = b.d AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
           CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
                     WHEN n * sxy - sx * sy < 0 THEN -1
                     ELSE 0 END AS INT) AS corr_sign,
           CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                THEN NULL
                ELSE CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy)
                           * 1000000)
                          // ((n * sxx - sx * sx)
                              * (n * syy - sy * sy)) AS BIGINT)
           END AS r2_ppm
    FROM pairs
    ORDER BY type_a, type_b
    """.format(**_ORACLE_TABLES)
    register("ts_pairwise_correlation", run, oracle=oracle)


_register_pairwise_corr()


# ----------------------------------------- weekday seasonality index (r12)
def _register_weekday_profile() -> None:
    """Calendar-seasonality profile: per ISO weekday (1=Mon..7=Sun),
    order volume and revenue with each side's index against the
    uniform-week null (ppm; 1 000 000 = that weekday carries exactly
    1/7 of the metric) — the one-page readout behind staffing /
    capacity seasonality decisions and the input to weekday-aware
    forecasting baselines (the snaive lag-7 choice in the MASE entry
    presumes exactly this structure exists).

    Exactness: idx_ppm = 7e6 * metric_w div metric_total with the
    numerator in DECIMAL(38,0) (Spark) / HUGEINT (oracle) — revenue
    cents * 7e6 passes BIGINT at warehouse scale.  ONE scan, one
    7-row groupBy, totals via a window over the 7-row frame.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
    WITH base AS (
      SELECT {isodow} AS wd,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM {orders}
    ),
    byday AS (
      SELECT wd, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS revenue_cents
      FROM base GROUP BY wd
    )
    SELECT wd AS iso_weekday, n_orders, revenue_cents,
           CAST((CAST(7000000 AS {big}) * n_orders)
                {idiv} sum(n_orders) OVER () AS BIGINT)
             AS volume_idx_ppm,
           CAST((CAST(7000000 AS {big}) * revenue_cents)
                {idiv} sum(revenue_cents) OVER () AS BIGINT)
             AS revenue_idx_ppm
    FROM byday
    ORDER BY wd
    """
    spark_sql = (
        tpl.replace("{isodow}", "CAST(weekday(o_orderdate) + 1 AS BIGINT)")
        .replace("{big}", "DECIMAL(38,0)")
        .replace("{idiv}", "div")
    ).format(**_SPARK_TABLES)
    oracle_sql = (
        tpl.replace("{isodow}", "CAST(isodow(o_orderdate) AS BIGINT)")
        .replace("{big}", "HUGEINT")
        .replace("{idiv}", "//")
    ).format(**_ORACLE_TABLES)
    register_sql("ts_weekday_profile", spark_sql, oracle_sql)


_register_weekday_profile()


# ------------------------------------- burstiness / dispersion index (r12)
def _register_dispersion_index() -> None:
    """Burstiness audit: the index of dispersion (Fano factor) of
    per-minute arrival counts for each event type — var(counts)/mean
    over a SHARED minute grid spanning the whole stream, so types are
    directly comparable.  Poisson arrivals give exactly 1.0 (1e6 ppm);
    bursty streams exceed it, metronomic ones fall below.  This is the
    standard first-look diagnostic before capacity planning / anomaly
    thresholds, and the natural companion to the SPC and CUSUM entries
    (their control limits presume a dispersion regime).

    Exactness: with N grid minutes, per-type token sum s and sum of
    squared counts q (zeros contribute nothing to either), the Fano
    factor is (N*q - s^2) / (N*s); scaled to ppm with the numerator in
    DECIMAL(38,0) (Spark) / HUGEINT (oracle) and integer division, the
    result replays bit-identically across engines.  Magnitude bound:
    1e6 * N * q stays under 1e38 up to ~1e12 events/minute-grid-year —
    far past any real stream (documented, not guarded).

    Scale shape (100 TB): ONE scan -> (type, minute) count — a
    map-side-combinable hash aggregation whose frame is |types| x
    |minutes|, then a |types|-row moments agg carrying per-type
    min/max minutes; the SHARED grid size is a window over that
    |types|-row frame (bounded — never a data-scale window), so the
    whole op is ONE events scan.  No per-event shuffle beyond the
    bucket groupBy, nothing data-scale in the final frame.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
    WITH b AS (
      SELECT event_type, {epmin} AS m, CAST(count(*) AS BIGINT) AS c
      FROM {events}
      GROUP BY event_type, {epmin}
    ),
    mo AS (
      SELECT event_type,
             CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS nonempty_buckets,
             CAST(sum(c * c) AS BIGINT) AS sumsq,
             min(m) AS mn, max(m) AS mx
      FROM b GROUP BY event_type
    ),
    -- the SHARED grid comes from a window over the |types|-row frame
    -- (per-type min/max compose to the global bounds) — ONE events
    -- scan total, no second aggregate branch
    gridded AS (
      SELECT event_type, n_events, nonempty_buckets, sumsq,
             CAST(max(mx) OVER () - min(mn) OVER () + 1 AS BIGINT) AS nb
      FROM mo
    )
    SELECT event_type, n_events, nonempty_buckets,
           nb AS grid_buckets,
           CAST(CAST(1000 AS {big}) * n_events {idiv} nb AS BIGINT)
             AS mean_per_bucket_milli,
           CAST(CAST(1000000 AS {big}) * nonempty_buckets {idiv} nb
                AS BIGINT) AS occupancy_ppm,
           CAST(CAST(1000000 AS {big})
                * (CAST(nb AS {big}) * sumsq
                   - CAST(n_events AS {big}) * n_events)
                {idiv} (CAST(nb AS {big}) * n_events) AS BIGINT)
             AS fano_ppm
    FROM gridded
    ORDER BY event_type
    """
    spark_sql = (
        tpl.replace(
            "{epmin}", "(unix_timestamp(date_trunc('minute', ts)) div 60)"
        )
        .replace("{big}", "DECIMAL(38,0)")
        .replace("{idiv}", "div")
    ).format(**_SPARK_TABLES)
    oracle_sql = (
        tpl.replace(
            "{epmin}", "(epoch(date_trunc('minute', ts)) // 60)"
        )
        .replace("{big}", "HUGEINT")
        .replace("{idiv}", "//")
    ).format(**_ORACLE_TABLES)
    register_sql("ts_dispersion_index", spark_sql, oracle_sql)


_register_dispersion_index()


def _register_turning_points() -> None:
    """Turning-point profile of the per-type daily revenue series —
    the direction-change census behind trend-vs-noise triage (a pure
    random walk turns at ~2/3 of interior points; a trending series
    turns far less; Kendall 1973's turning-point test statistic).

    Exactness: daily cents are exact BIGINT sums; peaks/troughs are
    strict integer comparisons against both neighbors (plateau points
    count as neither — documented tie rule); the rate is ONE floor of
    an IEEE double ratio of exact integers (identical on both
    engines).  Shape (100 TB): one fact scan -> (type, day) partial
    agg, two bounded lag/lead windows over the tiny daily frame
    partitioned per type, |types|-row output.
    """
    from dblab_ece_trino_spark.operators.registry import register_sql
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES

    tpl = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS cents
      FROM {events}
      GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, cents,
             lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS p,
             lead(cents) OVER (PARTITION BY event_type ORDER BY day) AS n
      FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN p IS NOT NULL AND n IS NOT NULL
                         AND cents > p AND cents > n
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks,
           CAST(sum(CASE WHEN p IS NOT NULL AND n IS NOT NULL
                         AND cents < p AND cents < n
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_troughs,
           CAST(CASE WHEN sum(CASE WHEN p IS NOT NULL AND n IS NOT NULL
                                   THEN 1 ELSE 0 END) > 0 THEN
             floor(1000000.0
                   * sum(CASE WHEN p IS NOT NULL AND n IS NOT NULL
                              AND ((cents > p AND cents > n)
                                   OR (cents < p AND cents < n))
                              THEN 1 ELSE 0 END)
                   / sum(CASE WHEN p IS NOT NULL AND n IS NOT NULL
                              THEN 1 ELSE 0 END))
           END AS BIGINT) AS turning_ppm
    FROM lagged
    GROUP BY event_type
    ORDER BY event_type
    """
    register_sql(
        "ts_turning_points",
        tpl.format(**_SPARK_TABLES),
        tpl.format(**_ORACLE_TABLES),
    )


_register_turning_points()


def _register_holt_trend() -> None:
    """Holt's linear-trend double exponential smoothing over the
    per-type daily mean series — the trend-aware sibling of ``ts_ewma``
    (level-only, bounded kernel): level and trend states evolve by
    true recursion, so the entry rides Spark 4's WITH RECURSIVE
    (same recursion text on DuckDB), the ``op_recursive_cte`` surface
    applied to a real forecasting primitive.

    Exactness: the daily mean comes from an exact DECIMAL sum divided
    once (the ts_zscore discipline — float-native avg differs in last
    ulps between engines), and the smoothing constants alpha = 0.25,
    beta = 0.5 are BINARY-EXACT doubles, so the sequential recurrence
    is the same IEEE op sequence on both engines; outputs are BIGINT
    1e-4 units via floor(x*10000 + 0.5) — library round(double, n)
    semantics DIVERGE across engines at decimal ties (Spark rounds the
    shortest decimal repr HALF_UP, DuckDB rounds the binary value), a
    hazard this entry's own re-derivation test exposed, while
    multiply+add+floor is the identical IEEE op sequence everywhere.

    Shape (100 TB): the daily rollup is computed ONCE (the only
    fact-table pass) and ranked on metadata-scale partitions.  The
    recursion lives on |types| x |days| rows — metadata-scale BY
    CONSTRUCTION (a fixed type alphabet x a reporting window), so it
    runs as a bounded driver kernel (round-16 optimization; the
    _cc_min_label_bounded precedent): ONE collect of the ranked rollup,
    the recurrence replayed in Python — whose floats ARE IEEE-754
    doubles, and the update expressions are transcribed
    association-for-association, so every state is bit-identical to the
    WITH RECURSIVE form (equivalence pinned per-value in
    tests/test_round16_opt.py) — then one createDataFrame back.  The
    recursive-CTE form paid |days| (30) sequential join-project jobs of
    pure fixed overhead per call (~2 s at sf0.1 AFTER its inputs were
    materialized; Spark executes each recursion level as a separate
    stage) at every scale factor.
    """
    from dblab_ece_trino_spark.operators.registry import register
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES

    rec_tpl = """
    WITH RECURSIVE hw(event_type, rn, bar_day, y, l, b) AS (
      SELECT event_type, rn, bar_day, y, y, CAST(0.0 AS DOUBLE)
      FROM {r} WHERE rn = 1
      UNION ALL
      SELECT r.event_type, r.rn, r.bar_day, r.y,
             0.25 * r.y + 0.75 * (hw.l + hw.b),
             0.5 * ((0.25 * r.y + 0.75 * (hw.l + hw.b)) - hw.l)
               + 0.5 * hw.b
      FROM hw
      JOIN {r} r ON r.event_type = hw.event_type AND r.rn = hw.rn + 1
    )
    SELECT event_type, rn, bar_day,
           CAST(floor(y * 10000 + 0.5) AS BIGINT) AS y_e4,
           CAST(floor(l * 10000 + 0.5) AS BIGINT) AS level_e4,
           CAST(floor(b * 10000 + 0.5) AS BIGINT) AS trend_e4,
           CAST(floor((l + b) * 10000 + 0.5) AS BIGINT) AS forecast_e4
    FROM hw
    ORDER BY event_type, rn
    """

    def _ranked_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dblab_ece_trino_spark.entrypoints import engine_for
        from dblab_ece_trino_spark.session import materialize

        ev = engine_for(spark, sf_dir).catalogs.table(
            "elastic.default.events"
        )
        daily = ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("bar_day"),
        ).agg(
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("y")
        )
        # the rank window runs on the materialized |types| x |days|
        # rollup — metadata-scale partitions, never the fact table
        w = Window.partitionBy("event_type").orderBy("bar_day")
        return materialize(
            daily.withColumn(
                "rn", F.row_number().over(w).cast("bigint")
            )
        )

    def run_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
        # The distributed WITH RECURSIVE form — kept as the
        # cross-checkable twin the kernel is pinned against in pytest.
        ranked = _ranked_daily(spark, sf_dir)
        ranked.createOrReplaceTempView("__holt_daily_r14")
        return spark.sql(rec_tpl.format(r="__holt_daily_r14"))

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        import math

        ranked = _ranked_daily(spark, sf_dir)
        series: dict = {}
        for r in ranked.collect():
            series.setdefault(r["event_type"], []).append(
                (r["rn"], r["bar_day"], r["y"])
            )
        out = []
        for etype in sorted(series):
            rows = sorted(series[etype])
            l = b = 0.0
            for rn, bar_day, y in rows:
                if rn == 1:
                    l, b = y, 0.0
                else:
                    # same association order as the SQL text:
                    # (0.25*y) + (0.75*(l+b)); 0.5*(lnew-l) + 0.5*b
                    lnew = 0.25 * y + 0.75 * (l + b)
                    b = 0.5 * (lnew - l) + 0.5 * b
                    l = lnew
                out.append(
                    (
                        etype,
                        rn,
                        bar_day,
                        int(math.floor(y * 10000 + 0.5)),
                        int(math.floor(l * 10000 + 0.5)),
                        int(math.floor(b * 10000 + 0.5)),
                        int(math.floor((l + b) * 10000 + 0.5)),
                    )
                )
        return spark.createDataFrame(
            out,
            schema=(
                "event_type string, rn bigint, bar_day date, y_e4 bigint,"
                " level_e4 bigint, trend_e4 bigint, forecast_e4 bigint"
            ),
        ).orderBy("event_type", "rn")

    run.recursive_sql_twin = run_recursive_sql

    oracle = """
    WITH RECURSIVE d AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS bar_day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) AS y
      FROM {events}
      GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ),
    rr AS (
      SELECT event_type, bar_day, y,
             CAST(row_number() OVER (
               PARTITION BY event_type ORDER BY bar_day) AS BIGINT) AS rn
      FROM d
    ),
""".format(**_ORACLE_TABLES) + rec_tpl.format(r="rr").replace(
        "WITH RECURSIVE ", "", 1
    )
    register("ts_holt_trend", run, oracle=oracle)


_register_holt_trend()


def _register_holtwinters() -> None:
    """Holt-Winters ADDITIVE-SEASONAL triple exponential smoothing over
    the per-type daily mean series — the seasonal third state on top of
    ``ts_holt_trend`` (level+trend, green r14): what a capacity-planning
    user actually forecasts with when the series has a weekly rhythm
    (the synthetic events series is built with a weekday profile, see
    ``ts_weekday_profile``).  Season length m = 7 (weekday cycle).

    State recursion (Holt-Winters additive form, alpha=0.25 beta=0.5
    gamma=0.25 — ALL BINARY-EXACT doubles, complements 0.75/0.5/0.75
    exact too, so the sequential recurrence is the identical IEEE op
    sequence on both engines; 0.3-style constants are avoided because
    DuckDB parses decimal literals as DECIMAL before promoting):

        l_t = alpha*(y_t - s_{t-m}) + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
        s_t = gamma*(y_t - l_t)    + (1-gamma)*s_{t-m}

    The m-deep seasonal memory rides the recursion as SEVEN explicit
    state columns rotated each step (s1 = oldest = s_{t-m}; the new
    seasonal enters at s7) — arrays would work but element access and
    append syntax diverge between engines, while plain columns keep
    the recursion text byte-identical on both.

    Initialization (classic two-season init): l_7 = mean(y_1..y_7),
    b_7 = (mean(y_8..y_14) - mean(y_1..y_7)) / 7, s_i = y_i - l_7.
    The init means are written as LITERAL left-associated 7-term sums
    over a pivoted one-row-per-type frame — an aggregate sum() over
    doubles is partition-order dependent in Spark and would diverge
    from DuckDB's sequential sum in the last ulps (the ts_zscore
    hazard, float edition); a fixed-order expression is the same IEEE
    sequence everywhere.

    Outputs are BIGINT 1e-4 micro-units via floor(x*10000 + 0.5) — the
    round(double, n) cross-engine tie trap documented in ts_holt_trend.

    Shape (100 TB): daily rollup exact-decimal-summed from the fact
    table ONCE (the only fact pass); the pivot, init, and recursion
    live on |types| x |days| rows — metadata scale BY CONSTRUCTION, so
    (round-16 optimization, the ts_holt_trend precedent) the recursion
    runs as a bounded driver kernel: ONE collect of the ranked rollup,
    the init sums and the three-state recurrence replayed in Python —
    IEEE-754 doubles with the SQL text's association order transcribed
    exactly, so every state is bit-identical to the WITH RECURSIVE
    form (pinned per-value in tests/test_round16_opt.py) — then one
    createDataFrame back.  The recursive-CTE form paid |days|-m (23)
    sequential join-project jobs of fixed overhead per call (~2 s at
    sf0.1) at every scale factor.
    """
    from dblab_ece_trino_spark.operators.registry import register
    from dblab_ece_trino_spark.queries import _ORACLE_TABLES

    m = 7
    piv_y = ", ".join(
        f"max(CASE WHEN rn = {i} THEN y END) AS y{i}" for i in range(1, 15)
    )
    s1_7 = "(((((y1 + y2) + y3) + y4) + y5) + y6) + y7"
    s8_14 = "(((((y8 + y9) + y10) + y11) + y12) + y13) + y14"
    init_tpl = f"""
    SELECT event_type, d7,
           l0,
           (({s8_14}) / CAST(7 AS DOUBLE) - l0) / CAST(7 AS DOUBLE) AS b0,
           y1 - l0 AS s1, y2 - l0 AS s2, y3 - l0 AS s3, y4 - l0 AS s4,
           y5 - l0 AS s5, y6 - l0 AS s6, y7 - l0 AS s7
    FROM (
      SELECT event_type, d7, y1, y2, y3, y4, y5, y6, y7,
             y8, y9, y10, y11, y12, y13, y14,
             ({s1_7}) / CAST(7 AS DOUBLE) AS l0
      FROM (
        SELECT event_type, {piv_y},
               max(CASE WHEN rn = {m} THEN bar_day END) AS d7
        FROM {{r}} GROUP BY event_type
      ) p
    ) q
    WHERE y14 IS NOT NULL
    """
    # lnew repeated inline (no lateral alias refs — Spark and DuckDB
    # disagree on when those are legal inside recursive members)
    lnew = "0.25 * (r.y - hw.s1) + 0.75 * (hw.l + hw.b)"
    rec_tpl = f"""
    WITH RECURSIVE hw(event_type, rn, bar_day, y, l, b,
                      s1, s2, s3, s4, s5, s6, s7) AS (
      SELECT event_type, CAST({m} AS BIGINT), d7, CAST(0.0 AS DOUBLE),
             l0, b0, s1, s2, s3, s4, s5, s6, s7
      FROM {{init}}
      UNION ALL
      SELECT r.event_type, r.rn, r.bar_day, r.y,
             {lnew},
             0.5 * (({lnew}) - hw.l) + 0.5 * hw.b,
             hw.s2, hw.s3, hw.s4, hw.s5, hw.s6, hw.s7,
             0.25 * (r.y - ({lnew})) + 0.75 * hw.s1
      FROM hw
      JOIN {{r}} r ON r.event_type = hw.event_type AND r.rn = hw.rn + 1
    )
    SELECT event_type, rn, bar_day,
           CAST(floor(y * 10000 + 0.5) AS BIGINT) AS y_e4,
           CAST(floor(l * 10000 + 0.5) AS BIGINT) AS level_e4,
           CAST(floor(b * 10000 + 0.5) AS BIGINT) AS trend_e4,
           CAST(floor(s7 * 10000 + 0.5) AS BIGINT) AS seasonal_e4,
           CAST(floor((l + b + s1) * 10000 + 0.5) AS BIGINT)
             AS forecast_next_e4
    FROM hw
    WHERE rn > {m}
    ORDER BY event_type, rn
    """

    def _ranked_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dblab_ece_trino_spark.entrypoints import engine_for
        from dblab_ece_trino_spark.session import materialize

        ev = engine_for(spark, sf_dir).catalogs.table(
            "elastic.default.events"
        )
        daily = ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("bar_day"),
        ).agg(
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("y")
        )
        w = Window.partitionBy("event_type").orderBy("bar_day")
        return materialize(
            daily.withColumn("rn", F.row_number().over(w).cast("bigint"))
        )

    def run_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
        # The distributed WITH RECURSIVE form — kept as the
        # cross-checkable twin the kernel is pinned against in pytest.
        ranked = _ranked_daily(spark, sf_dir)
        ranked.createOrReplaceTempView("__hw_daily_r15")
        init = spark.sql(init_tpl.format(r="__hw_daily_r15"))
        from dblab_ece_trino_spark.session import materialize

        init = materialize(init)
        init.createOrReplaceTempView("__hw_init_r15")
        return spark.sql(
            rec_tpl.format(init="__hw_init_r15", r="__hw_daily_r15")
        )

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        import math

        ranked = _ranked_daily(spark, sf_dir)
        series: dict = {}
        for r in ranked.collect():
            series.setdefault(r["event_type"], []).append(
                (r["rn"], r["bar_day"], r["y"])
            )
        out = []
        for etype in sorted(series):
            rows = sorted(series[etype])
            if len(rows) < 2 * m:  # init needs y1..y14 (WHERE y14 IS NOT NULL)
                continue
            ys = [y for _, _, y in rows]
            # literal left-associated init sums — the SQL text's exact
            # IEEE sequence: ((((((y1+y2)+y3)+y4)+y5)+y6)+y7) / 7.0
            s1_7 = ys[0]
            for v in ys[1:m]:
                s1_7 = s1_7 + v
            s8_14 = ys[m]
            for v in ys[m + 1:2 * m]:
                s8_14 = s8_14 + v
            l = s1_7 / 7.0
            b = (s8_14 / 7.0 - l) / 7.0
            s = [ys[i] - l for i in range(m)]  # s1..s7 (oldest first)
            for rn, bar_day, y in rows[m:]:
                # association order exactly as the recursive SQL text:
                # lnew = 0.25*(y - s1) + 0.75*(l + b)
                # bnew = 0.5*(lnew - l) + 0.5*b
                # snew = 0.25*(y - lnew) + 0.75*s1
                lnew = 0.25 * (y - s[0]) + 0.75 * (l + b)
                bnew = 0.5 * (lnew - l) + 0.5 * b
                snew = 0.25 * (y - lnew) + 0.75 * s[0]
                l, b = lnew, bnew
                s = s[1:] + [snew]
                out.append(
                    (
                        etype,
                        rn,
                        bar_day,
                        int(math.floor(y * 10000 + 0.5)),
                        int(math.floor(l * 10000 + 0.5)),
                        int(math.floor(b * 10000 + 0.5)),
                        int(math.floor(s[-1] * 10000 + 0.5)),
                        int(math.floor((l + b + s[0]) * 10000 + 0.5)),
                    )
                )
        return spark.createDataFrame(
            out,
            schema=(
                "event_type string, rn bigint, bar_day date, y_e4 bigint,"
                " level_e4 bigint, trend_e4 bigint, seasonal_e4 bigint,"
                " forecast_next_e4 bigint"
            ),
        ).orderBy("event_type", "rn")

    run.recursive_sql_twin = run_recursive_sql

    oracle = (
        """
    WITH RECURSIVE d AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS bar_day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) AS y
      FROM {events}
      GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ),
    rr AS (
      SELECT event_type, bar_day, y,
             CAST(row_number() OVER (
               PARTITION BY event_type ORDER BY bar_day) AS BIGINT) AS rn
      FROM d
    ),
    ini AS (
""".format(**_ORACLE_TABLES)
        + init_tpl.format(r="rr")
        + "),"
        + rec_tpl.format(init="ini", r="rr").replace(
            "WITH RECURSIVE ", "", 1
        )
    )
    register("ts_holtwinters", run, oracle=oracle)


_register_holtwinters()
