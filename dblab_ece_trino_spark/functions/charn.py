"""char(N) blank-padding discipline (SURVEY §7 hard part 2).

The reference's TPC-DS columns include char(2)/char(20)/char(30)
(ca_state, customer names — q003 explain.txt:6, q005 explain.txt:32);
Trino compares char values pad-insensitively, so grouping/EXCEPT keys over
them must not split on trailing blanks.  Spark's CharType only normalizes
on write to tables with that schema; for data arriving via parquet/JDBC as
padded strings, apply ``char_normalize`` at scan time to every char(N)
column before it is used as a join/group/set-op key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_normalize(col: Column) -> Column:
    """Pad-insensitive canonical form of a char(N) value (rtrim).

    NULL stays NULL; an all-blank value normalizes to the empty string —
    matching Trino's char comparison semantics where 'AB' = 'AB  '.
    """
    return F.rtrim(col)


def normalize_char_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Apply the rtrim discipline to the named columns (scan-time hook)."""
    for c in columns:
        df = df.withColumn(c, char_normalize(F.col(c)))
    return df
