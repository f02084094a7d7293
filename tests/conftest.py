"""Shared fixtures: one SparkSession per test run + a DuckDB oracle.

The oracle comparison mirrors the driver's correctness gate: run the Spark
query and the ANSI-SQL oracle on the same parquet tables, then compare
row count, column names, and an order-insensitive normalized value
multiset (SURVEY §5's golden-output method, made engine-neutral).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from dblab_ece_trino_spark.session import EngineSession

    eng = EngineSession.get(app_name="tests")
    yield eng.spark
    eng.spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def duck_for(con: duckdb.DuckDBPyConnection, sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Cursor with the testdata views registered (driver-parity naming)."""
    cur = con.cursor()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            cur.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return cur


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def normalized_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows — order-insensitive."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _pd_str_rows(pdf) -> tuple[list[str], list[tuple]]:
    """Render a pandas DataFrame the way the driver's hash sees it.

    The driver converts BOTH result sets to pandas and compares per-column
    string renderings (round-1 forensics, VERDICT W1/W2): DuckDB DECIMAL
    and HUGEINT become float64 ('1234.5'), nullable ints become float64
    ('3.0'/'nan'), DATE becomes datetime64 rendered date-only at midnight.
    Mirroring that here means local green predicts driver green — the
    lenient Decimal-normalizing comparison this replaces masked exactly
    the round-1 hash failures.
    """
    cols = [c.lower() for c in pdf.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = [pdf.iloc[:, i].astype(str).tolist() for i in range(len(cols))]
    rows = sorted(
        tuple(rendered[i][r] for i in order) for r in range(len(pdf))
    )
    return [cols[i] for i in order], rows


def assert_matches_oracle(spark_df, duck_cur, oracle_sql: str):
    spark_pdf = spark_df.toPandas()
    rel = duck_cur.sql(oracle_sql)
    duck_pdf = rel.df()
    spark_cols, s = _pd_str_rows(spark_pdf)
    duck_cols, d = _pd_str_rows(duck_pdf)
    assert spark_cols == duck_cols, (
        f"column mismatch: spark={spark_cols} duckdb={duck_cols}"
    )
    assert len(s) == len(d), (
        f"row count mismatch: spark={len(s)} duckdb={len(d)}"
    )
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
