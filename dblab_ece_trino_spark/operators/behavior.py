"""User-behavior analytics over the events stream: ordered funnel
conversion, weekly cohort retention, and BM25 relevance scoring over the
document corpus — the product-analytics / IR surface a warehouse user
expects next to the relational operators (beyond-parity, SURVEY §2.8
family; the reference ships the function surface but no behavioral
macros, so these are the composed forms).

Scale notes (100 TB lens):

- ``op_funnel_conversion`` is three keyed aggregations and three joins,
  ALL on user_id — one partitioning reused across every stage (AQE
  coalesces the identical exchanges), no global operator anywhere.
- ``op_cohort_retention`` reduces events to (user, week) pairs before
  any join (DISTINCT projection — the wide events payload never crosses
  a shuffle), then joins the tiny per-user cohort frame and aggregates.
  Output cardinality is cohorts x offsets — metadata-scale.
- ``text_bm25_score`` computes document length and term frequency in
  one token explode, derives corpus stats (2 values) and per-term
  document frequencies (|query| rows) as broadcast frames, and scores
  with a FIXED-ORDER sum over pivoted per-term scores: the textual
  addition order is identical on both engines, so the doubles are
  bit-equal before the final round (float sums over an unordered GROUP
  BY would be last-ulp order-sensitive).  Tokens not in the query are
  dropped before the per-(doc, term) aggregation, so the shuffled frame
  is O(matching tokens), not O(corpus tokens).

Week arithmetic parity: ``date_trunc('week', ...)`` is Monday-start on
both engines but returns TIMESTAMP in Spark vs the same in DuckDB —
both sides CAST to DATE (memory: oracle-parity pitfall), and the week
offset is an exact integer (day difference of week-truncated dates is
always a multiple of 7; the CAST after /7 truncates an exact double).
"""

from __future__ import annotations

from dblab_ece_trino_spark.operators.registry import register_sql
from dblab_ece_trino_spark.queries import _ORACLE_TABLES, _SPARK_TABLES


def _both(name: str, spark_tpl: str, oracle_tpl: str | None = None) -> None:
    oracle_tpl = oracle_tpl if oracle_tpl is not None else spark_tpl
    register_sql(
        name,
        spark_tpl.format(**_SPARK_TABLES),
        oracle_tpl.format(**_ORACLE_TABLES),
    )


# Ordered funnel: first view, first click AFTER that view, first
# purchase AFTER that click — strictly ordered stages per user (the
# "did the user progress" question attribution models start from).
# SINGLE-SCAN form: three stacked whole-partition windows on user_id
# (each stage's conditional min can see the previous stage's timestamp
# on every row), then one keyed agg that reuses the window exchange's
# partitioning — 1 scan, 1 exchange, 3 window passes, 0 joins
# (plan-asserted).  The join formulation (first-view agg ⋈ clicks ⋈
# purchases) re-derives the events lineage once per stage — 6 scans in
# the plan census — which is the difference between reading a 100 TB
# event log once and reading it six times.  Identical SQL on both
# engines; the windows have no ORDER BY (whole-partition frame), so
# there is no per-partition sort either.
_both(
    "op_funnel_conversion",
    """
    WITH w1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
      FROM {events}
    ),
    w2 AS (
      SELECT user_id, ts, event_type, t_view,
             min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
               OVER (PARTITION BY user_id) AS t_click
      FROM w1
    ),
    w3 AS (
      SELECT user_id, t_view, t_click,
             min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
               OVER (PARTITION BY user_id) AS t_purchase
      FROM w2
    )
    SELECT user_id, min(t_view) AS t_view, min(t_click) AS t_click,
           min(t_purchase) AS t_purchase,
           CAST(1 + CASE WHEN min(t_click) IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN min(t_purchase) IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS stage
    FROM w3
    WHERE t_view IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)

# Weekly cohort retention: cohort = week of a user's first event;
# n_active = distinct cohort members active k weeks later.  Counts only
# (exact integers) — rates are the caller's division.
_COHORT_TPL = """
    WITH f AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM {events} GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS activity_week
      FROM {events}
    ),
    j AS (
      SELECT f.cohort_week,
             CAST({datediff} / 7 AS BIGINT) AS week_offset,
             a.user_id
      FROM a JOIN f ON a.user_id = f.user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
      FROM f GROUP BY cohort_week
    )
    SELECT j.cohort_week, j.week_offset,
           CAST(count(DISTINCT j.user_id) AS BIGINT) AS n_active,
           s.n_cohort
    FROM j JOIN sizes s ON j.cohort_week = s.cohort_week
    GROUP BY j.cohort_week, j.week_offset, s.n_cohort
    ORDER BY j.cohort_week, j.week_offset
"""

_both(
    "op_cohort_retention",
    _COHORT_TPL.replace(
        "{datediff}", "datediff(a.activity_week, f.cohort_week)"
    ),
    _COHORT_TPL.replace(
        "{datediff}", "datediff('day', f.cohort_week, a.activity_week)"
    ),
)

# BM25 (k1=1.2, b=0.75) for a fixed query term set.  idf is the
# "+1-inside-the-log" form (always positive); dl/avgdl is expressed as
# dl * n_docs / tot_dl so every double derives from exact integers with
# identical expression text.  The per-term scores are pivoted and summed
# in FIXED textual order — see module docstring.
_BM25_BODY = """
    dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS tot_dl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE tok IN ('table', 'fast', 'row')
      GROUP BY doc_id, tok
    ),
    dfreq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ),
    term AS (
      SELECT tf.doc_id, tf.tok,
             ln(1 + (CAST(s.n_docs AS DOUBLE) - dfreq.df + 0.5)
                    / (dfreq.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                               * CAST(s.n_docs AS DOUBLE) / s.tot_dl))
               AS term_score
      FROM tf
      JOIN dl ON tf.doc_id = dl.doc_id
      JOIN dfreq ON tf.tok = dfreq.tok
      CROSS JOIN stats s
    ),
    pivoted AS (
      SELECT doc_id,
             max(CASE WHEN tok = 'table' THEN term_score END) AS s_table,
             max(CASE WHEN tok = 'fast' THEN term_score END) AS s_fast,
             max(CASE WHEN tok = 'row' THEN term_score END) AS s_row,
             CAST(count(*) AS BIGINT) AS n_query_terms
      FROM term GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(round(coalesce(s_table, 0.0) + coalesce(s_fast, 0.0)
                      + coalesce(s_row, 0.0), 6) AS DOUBLE) AS bm25,
           n_query_terms
    FROM pivoted
"""

# Markov transition counts over each user's event sequence: one keyed
# lag window (hash shuffle on user_id, per-user sort), then a tiny
# (|event types|²)-row aggregate.  The standard "what follows what"
# path-mining first pass.  Identical SQL on both engines.
_both(
    "op_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM {events}
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, next_type
    """,
)

# Rolling 7-day distinct active users.  The scalable form: reduce to
# DISTINCT (day, user) first (payload never shuffles again), then
# EXPAND each activity day to the 7 target days it contributes to (a
# bounded explode — 7 rows per pair) and count distinct users per
# target day.  This replaces the O(days x pairs) range self-join with a
# linear explode, the same trick as joins.py's bucketized range join.
_ROLLING_DAU_TPL = """
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
      FROM {events}
    ),
    expanded AS (
      SELECT user_id, {expand} AS target_day FROM du
    )
    SELECT CAST(target_day AS DATE) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS dau_7d
    FROM expanded
    GROUP BY target_day
    ORDER BY day
"""

_both(
    "op_rolling_dau",
    _ROLLING_DAU_TPL.replace(
        "{expand}", "explode(sequence(d, date_add(d, 6)))"
    ),
    _ROLLING_DAU_TPL.replace(
        "{expand}", "unnest(generate_series(d, d + 6, INTERVAL 1 DAY))"
    ),
)

_both(
    "text_bm25_score",
    (
        """
    WITH toks AS (
      SELECT doc_id, tok FROM {documents}
      LATERAL VIEW explode(split(trim(text), '\\\\s+')) t AS tok
    ),
    """
        + _BM25_BODY
    ),
    (
        r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM {documents}
    ),
    """
        + _BM25_BODY
    ),
)
