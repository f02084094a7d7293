"""Skew-resistant aggregation helpers.

AQE's skew-join splitting handles joins (session.py enables it), but a
groupBy whose hot key dwarfs the rest still funnels one reducer.  The
classic fix is two-phase salted aggregation: shuffle once on
(key, salt) so the hot key spreads over ``n_salts`` reducers, then a
second tiny shuffle on the key re-combines the partials.  Valid for any
algebraic aggregate (sum/count/min/max — re-aggregation of partials is
exact); the q003 analog's skewed group (one dominant state) is the
reference's real-world instance (SURVEY §7.7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_alias: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted groupBy.

    ``sums`` maps input column -> output alias (summed); ``count_alias``
    adds a count(*) output.  Results are exactly equal to the direct
    groupBy (partials of sums/counts recombine losslessly).
    """
    sums = sums or {}
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1_aggs = [F.sum(c).alias(f"__p_{a}") for c, a in sums.items()]
    if count_alias:
        phase1_aggs.append(F.count("*").alias("__p_cnt"))
    p1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*phase1_aggs)
    )
    phase2_aggs = [F.sum(f"__p_{a}").alias(a) for a in sums.values()]
    if count_alias:
        phase2_aggs.append(F.sum("__p_cnt").alias(count_alias))
    return p1.groupBy(*keys).agg(*phase2_aggs)
