"""Deterministic TPC-DS-style generator source (SURVEY §2.1).

The reference's load pipeline reads every table from Trino's built-in
``tpcds`` generator catalog (``SELECT * FROM tpcds.sfN.<t>`` —
data-loader/loader.py:166, table list loader.py:312-322) — a *connector
that computes rows at scan time* instead of reading storage.  This is the
Spark-first analog: each table is a projection over ``spark.range`` —
parallel (range splits across the cluster), storage-free, and
deterministic (every column is a pure JVM expression of the row id, no
RNG state), so two scans — or two *clusters* — produce identical rows.

Scale notes: ``spark.range(n, numPartitions=p)`` generates in p parallel
tasks with zero shuffle; column expressions are whole-stage-codegen'd.
Generating 100 TB is therefore embarrassingly parallel, exactly like the
reference's generator connector, and the CTAS load path
(loader.ctas_load) consumes these DataFrames like any other source.

Schema subset: the columns the reference's five queries actually touch
(q001-q005: ss_/cs_/ws_ fact keys + quantities/prices, date_dim's
d_date_sk/d_date/d_month_seq/d_year, customer names, ca_state char(2),
sr returns, reason) plus enough surrounding columns to make the tables
real.  ``ca_state`` is emitted blank-padded like a true char(2) column so
the char-discipline option (catalog 'char_columns') has something to
bite on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: base cardinalities at sf=1 (facts scale linearly with sf, dims with
#: the TPC-DS-style sublinear factor captured by ``dim=True``)
_TABLES: dict[str, dict] = {
    "date_dim": {"rows": 1096, "dim": True},  # 3 years of days
    "customer": {"rows": 1000, "dim": False},
    "customer_address": {"rows": 500, "dim": False},
    "item": {"rows": 200, "dim": True},
    "store": {"rows": 12, "dim": True},
    "reason": {"rows": 35, "dim": True},
    "store_sales": {"rows": 10000, "dim": False},
    "store_returns": {"rows": 1000, "dim": False},
    "catalog_sales": {"rows": 10000, "dim": False},
    "web_sales": {"rows": 10000, "dim": False},
}

_STATES = ["TX", "CA", "NY", "WA", "IL", "GA", "OH", "MI"]
#: TPC-DS date surrogate keys are Julian day numbers and the reference's
#: literal queries filter on them (queries/q001.sql:4 ``ss_sold_date_sk
#: BETWEEN 2451545 AND 2488070`` = 2000-01-01..2100-01-26).  The
#: generated 3-year calendar starts 1999-01-01 (Julian 2451180), so the
#: reference window covers days 365..1095 of the calendar — the literal
#: BETWEEN is a genuine ~2/3 filter, neither empty nor all-pass.
_EPOCH = "1999-01-01"
_JULIAN_BASE = 2451180  # Julian day number of 1999-01-01


def _h(seed: str, *cols: Column) -> Column:
    """Deterministic non-negative hash stream, one per (table, column)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def _price(seed: str, id_col: Column, lo: int, hi: int) -> Column:
    """Deterministic DECIMAL(7,2) price in [lo, hi)."""
    cents = _h(seed, id_col) % ((hi - lo) * 100)
    return (F.lit(lo) + cents / F.lit(100.0)).cast("decimal(7,2)")


def table_rows(table: str, sf: float) -> int:
    spec = _TABLES[table]
    if spec["dim"]:
        return spec["rows"]
    return max(1, int(spec["rows"] * sf))


def gen_table(
    spark: SparkSession, table: str, sf: float = 1.0, num_partitions: int | None = None
) -> DataFrame:
    if table not in _TABLES:
        raise KeyError(
            f"unknown generator table {table!r}; have {sorted(_TABLES)}"
        )
    n = table_rows(table, sf)
    base = spark.range(0, n, numPartitions=num_partitions or min(32, max(1, n // 1000)))
    i = F.col("id")
    n_dates = table_rows("date_dim", sf)
    n_cust = table_rows("customer", sf)
    n_addr = table_rows("customer_address", sf)
    n_item = table_rows("item", sf)
    n_store = table_rows("store", sf)
    n_reason = table_rows("reason", sf)

    if table == "date_dim":
        d = F.date_add(F.lit(_EPOCH).cast("date"), i.cast("int"))
        return base.select(
            (i + _JULIAN_BASE).alias("d_date_sk"),
            d.alias("d_date"),
            # TPC-DS convention: month sequence counted from 1900-01, so
            # the reference's literal ``d_month_seq BETWEEN 1193 AND
            # 1193+11`` (queries/q005.sql:6) = 1999-06..2000-05 lands
            # inside the generated 1188..1223 range
            ((F.year(d) - 1900) * 12 + F.month(d) - 1).alias("d_month_seq"),
            F.year(d).alias("d_year"),
            F.month(d).alias("d_moy"),
            F.dayofmonth(d).alias("d_dom"),
        )
    if table == "customer":
        return base.select(
            i.alias("c_customer_sk"),
            F.concat(F.lit("AAAAAAAA"), i.cast("string")).alias("c_customer_id"),
            # blank-padded like the reference's char(20)/char(30) name
            # columns (q005 explain.txt:32) — the char-discipline trap
            F.rpad(
                F.concat(F.lit("First"), (_h("cf", i) % 500).cast("string")), 20, " "
            ).alias("c_first_name"),
            F.rpad(
                F.concat(F.lit("Last"), (_h("cl", i) % 500).cast("string")), 30, " "
            ).alias("c_last_name"),
            (_h("ca", i) % n_addr).alias("c_current_addr_sk"),
            (_h("cd", i) % n_dates + _JULIAN_BASE).alias("c_first_sales_date_sk"),
        )
    if table == "customer_address":
        state = F.element_at(
            F.array(*[F.lit(s) for s in _STATES]),
            (_h("st", i) % len(_STATES) + 1).cast("int"),
        )
        return base.select(
            i.alias("ca_address_sk"),
            F.concat(F.lit("addr_"), i.cast("string")).alias("ca_address_id"),
            state.alias("ca_state"),  # char(2), exact width
            (_h("zip", i) % 99999).cast("int").alias("ca_zip"),
        )
    if table == "item":
        return base.select(
            i.alias("i_item_sk"),
            F.concat(F.lit("item_"), i.cast("string")).alias("i_item_id"),
            F.element_at(
                F.array(F.lit("PROMO"), F.lit("REGULAR"), F.lit("CLEARANCE")),
                (_h("it", i) % 3 + 1).cast("int"),
            ).alias("i_category"),
            _price("ip", i, 1, 100).alias("i_current_price"),
        )
    if table == "store":
        return base.select(
            i.alias("s_store_sk"),
            F.concat(F.lit("store_"), i.cast("string")).alias("s_store_id"),
            F.element_at(
                F.array(*[F.lit(s) for s in _STATES]),
                (_h("ss", i) % len(_STATES) + 1).cast("int"),
            ).alias("s_state"),
        )
    if table == "reason":
        return base.select(
            i.alias("r_reason_sk"),
            F.concat(F.lit("reason_"), i.cast("string")).alias("r_reason_id"),
            F.concat(F.lit("Reason description "), i.cast("string")).alias(
                "r_reason_desc"
            ),
        )
    if table == "store_sales":
        qty = (_h("sq", i) % 100 + 1).cast("int")
        price = _price("sp", i, 1, 200)
        return base.select(
            (_h("sd", i) % n_dates + _JULIAN_BASE).alias("ss_sold_date_sk"),
            i.alias("ss_item_sk"),  # with ticket number forms the row key
            (i % max(1, n // 4)).alias("ss_ticket_number"),
            (_h("sc", i) % n_cust).alias("ss_customer_sk"),
            (_h("so", i) % n_store).alias("ss_store_sk"),
            qty.alias("ss_quantity"),
            price.alias("ss_sales_price"),
            # TPC-DS: extended price = quantity * unit price (what the
            # reference's q001 literally sums, queries/q001.sql:1)
            (qty * price).cast("decimal(9,2)").alias("ss_ext_sales_price"),
            _price("sn", i, 1, 20000).alias("ss_net_paid"),
        )
    if table == "store_returns":
        # each return targets a concrete sale: row id k of store_sales,
        # whose composite key is (ss_item_sk=k, ss_ticket_number=k%T) —
        # so the reference's literal q004 composite-key LEFT JOIN
        # (queries/q004.sql:15-17) actually matches (the old independent
        # hash streams made a match a 1/T accident)
        n_ss = table_rows("store_sales", sf)
        k = _h("ri", i) % n_ss
        return base.select(
            (_h("rd", i) % n_dates + _JULIAN_BASE).alias("sr_returned_date_sk"),
            k.alias("sr_item_sk"),
            (k % max(1, n_ss // 4)).alias("sr_ticket_number"),
            F.when(_h("rr7", i) % 7 == 0, F.lit(None).cast("long"))
            .otherwise(_h("rr", i) % n_reason)
            .alias("sr_reason_sk"),
            (_h("rq", i) % 50 + 1).cast("int").alias("sr_return_quantity"),
        )
    if table in ("catalog_sales", "web_sales"):
        p = "cs" if table == "catalog_sales" else "ws"
        qty = (_h(p + "q", i) % 100 + 1).cast("int")
        price = _price(p + "p", i, 1, 300)
        cols = [
            (_h(p + "d", i) % n_dates + _JULIAN_BASE).alias(f"{p}_sold_date_sk"),
            (_h(p + "c", i) % n_cust).alias(f"{p}_bill_customer_sk"),
            (_h(p + "i", i) % n_item).alias(f"{p}_item_sk"),
            (i % max(1, n // 3)).alias(f"{p}_order_number"),
            qty.alias(f"{p}_quantity"),
            price.alias(f"{p}_sales_price"),
        ]
        if p == "cs":
            # the reference's q002 sums cs_ext_sales_price and q003 joins
            # on cs_bill_addr_sk (queries/q002.sql:1, q003.sql:4)
            cols.insert(2, (_h("csa", i) % n_addr).alias("cs_bill_addr_sk"))
            cols.append(
                (qty * price).cast("decimal(9,2)").alias("cs_ext_sales_price")
            )
        return base.select(*cols)
    raise AssertionError(table)


def generator_tables() -> list[str]:
    return sorted(_TABLES)


# ------------------------------------------------------------ query entry
def _q_generator_invariants(spark: SparkSession, sf_dir: str):
    """Driver-gradable proof of the generator source: the VALUES are
    engine-specific (xxhash64 streams), but the generator's contract is
    not — row cardinality at sf=1 and every column's domain bound are
    deterministic constants an oracle can pin.  A generator bug (wrong
    modulus, broken fk range, price out of band) flips a boolean."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    eng = engine_for(spark, sf_dir)
    eng.catalogs.register_generator_schema(sf=1.0)
    ss = eng.catalogs.table("tpcds.sf1.store_sales")
    return ss.agg(
        F.count("*").alias("n_rows"),
        (
            (F.min("ss_sold_date_sk") >= _JULIAN_BASE)
            & (F.max("ss_sold_date_sk") < _JULIAN_BASE + 1096)
            & (F.min("ss_customer_sk") >= 0) & (F.max("ss_customer_sk") < 1000)
            & (F.min("ss_store_sk") >= 0) & (F.max("ss_store_sk") < 12)
        ).alias("fk_ok"),
        ((F.min("ss_quantity") >= 1) & (F.max("ss_quantity") <= 100)).alias("qty_ok"),
        (
            (F.min("ss_sales_price") >= 1) & (F.max("ss_sales_price") < 200)
        ).alias("price_ok"),
    )


def _q_generator_join_invariants(spark: SparkSession, sf_dir: str):
    """Referential integrity across generated tables, driver-gradable:
    inner-joining the fact to BOTH its dims must preserve the exact row
    count (every fk lands — the modulus contract), the joined year
    domain is pinned by date_dim's 1096-day calendar (1999-2001), and
    store states stay inside the 8-value domain.  Also the natural demo
    of generated dims riding broadcast joins (plan-asserted)."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    eng = engine_for(spark, sf_dir)
    eng.catalogs.register_generator_schema(sf=1.0)
    ss = eng.catalogs.table("tpcds.sf1.store_sales")
    dd = eng.catalogs.table("tpcds.sf1.date_dim")
    st = eng.catalogs.table("tpcds.sf1.store")
    j = ss.join(
        F.broadcast(dd), ss.ss_sold_date_sk == dd.d_date_sk
    ).join(F.broadcast(st), ss.ss_store_sk == st.s_store_sk)
    return j.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("d_year").alias("n_years"),
        ((F.min("d_year") == 1999) & (F.max("d_year") == 2001)).alias("years_ok"),
        (F.count_distinct("s_state") <= 8).alias("states_ok"),
    )


def _register_entry() -> None:
    from dblab_ece_trino_spark.operators.registry import register

    register(
        "gen_store_sales_invariants",
        _q_generator_invariants,
        oracle="""
        SELECT CAST(10000 AS BIGINT) AS n_rows,
               true AS fk_ok, true AS qty_ok, true AS price_ok
        """,
    )
    register(
        "gen_fact_dim_join_invariants",
        _q_generator_join_invariants,
        oracle="""
        SELECT CAST(10000 AS BIGINT) AS n_rows,
               CAST(3 AS BIGINT) AS n_years,
               true AS years_ok, true AS states_ok
        """,
    )


_register_entry()
