"""Multi-catalog registry: 3-part ``catalog.schema.table`` name resolution.

Reference parity: Trino's catalog system — ``psql`` (postgresql connector),
``mongodb``, ``elastic`` and the built-in ``tpcds`` generator catalog
(reference ansible/roles/trino/templates/values.yml.j2:35-61,
data-loader/loader.py:166).  Queries address tables as
``psql.tpcds.store_sales`` etc. (queries/q005.sql:3,9,15).

Spark design: rather than a JVM ``CatalogPlugin`` per store, the registry
maps each 3-part name to a storage spec (parquet dir today; JDBC / Mongo /
ES options gated behind the same interface) and registers a uniquely-mangled
temp view per table.  ``sql.rewrite_three_part_names`` rewrites query text
(including fully-qualified column refs like
``psql.tpcds.store_sales.ss_sold_date_sk``) to the mangled views, then
Catalyst resolves as usual.  This keeps the whole plan in one Catalyst
session so cross-catalog joins, runtime filters and AQE work across
"connectors" — which is exactly the property Trino's federation provides.

Scale notes: a parquet-backed table at 100 TB is a directory of many files;
``spark.read.parquet(dir)`` parallelizes by file/row-group split
(= Trino's connector splits, e.g. 85 splits for q003 in
results/q003/workers-1/query.json).  Filters and column pruning reach the
scan via DSv2 pushdown — verified in tests via ``PushedFilters`` in the
formatted plan.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_IDENT = re.compile(r"[^A-Za-z0-9_]")


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Column names stored as timestamp[ns] in the parquet footer."""
    import pyarrow.parquet as pq

    p = path
    if os.path.isdir(p):
        inside = [f for f in os.listdir(p) if f.endswith(".parquet")]
        if not inside:
            return []
        p = os.path.join(p, inside[0])
    schema = pq.read_schema(p)
    return [n for n, t in zip(schema.names, schema.types) if str(t) == "timestamp[ns]"]


def mangle(catalog: str, schema: str, table: str) -> str:
    """Deterministic valid-identifier view name for a 3-part name."""
    return "__cat_" + _IDENT.sub("_", f"{catalog}_{schema}_{table}".lower())


@dataclass
class TableSpec:
    catalog: str
    schema: str
    table: str
    fmt: str = "parquet"  # parquet | jdbc | mongo | es (non-parquet gated)
    path: str | None = None
    options: dict[str, str] = field(default_factory=dict)

    @property
    def full_name(self) -> str:
        return f"{self.catalog}.{self.schema}.{self.table}"

    @property
    def view_name(self) -> str:
        return mangle(self.catalog, self.schema, self.table)


class CatalogRegistry:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[tuple[str, str, str], TableSpec] = {}

    # ------------------------------------------------------------------ core
    def register(self, spec: TableSpec) -> TableSpec:
        key = (spec.catalog.lower(), spec.schema.lower(), spec.table.lower())
        self._tables[key] = spec
        self.load(spec).createOrReplaceTempView(spec.view_name)
        return spec

    def register_parquet(
        self, catalog: str, schema: str, table: str, path: str
    ) -> TableSpec:
        return self.register(TableSpec(catalog, schema, table, "parquet", path))

    def lookup(self, catalog: str, schema: str, table: str) -> TableSpec | None:
        return self._tables.get((catalog.lower(), schema.lower(), table.lower()))

    def _read_parquet(self, path: str) -> DataFrame:
        """Parquet scan that tolerates nanosecond timestamps.

        Spark's vectorized reader rejects TIMESTAMP(NANOS) columns (the
        driver's events table is timestamp[ns]); with the legacy
        nanosAsLong conf they arrive as raw int64 nanos, which we convert
        to TIMESTAMP_NTZ (integer DIV — no double round-trip, exact for
        the full int64 range).  This is a projection over the scan, so
        pushdown/pruning on other columns is unaffected.
        """
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self.spark.read.parquet(path)
        ns_cols = _nanos_timestamp_columns(path)
        for c in ns_cols:
            df = df.withColumn(
                c,
                F.expr(f"CAST(timestamp_micros(`{c}` DIV 1000) AS TIMESTAMP_NTZ)"),
            )
        return df

    def load(self, spec: TableSpec) -> DataFrame:
        if spec.fmt == "parquet":
            df = self._read_parquet(spec.path)
        elif spec.fmt in ("csv", "json"):
            from dblab_ece_trino_spark.sources import formats

            reader = formats.read_csv if spec.fmt == "csv" else formats.read_json
            df = reader(
                self.spark,
                spec.path,
                schema=spec.options.get("schema"),
                options={
                    k: v
                    for k, v in spec.options.items()
                    if k not in ("schema", "char_columns")
                }
                or None,
            )
        elif spec.fmt == "jdbc":
            # Real-store stretch path (reference values.yml.j2:35-39).
            # Computation pushdown (filters/aggregates) is built into
            # Spark's JDBC DSv2 — enabled via pushDownAggregate/pushDownLimit.
            reader = self.spark.read.format("jdbc")
            for k, v in spec.options.items():
                if k == "char_columns":
                    continue
                reader = reader.option(k, v)
            reader = reader.option("pushDownAggregate", "true").option(
                "pushDownLimit", "true"
            )
            df = reader.load()
        elif spec.fmt == "generator":
            # TPC-DS-style generator connector analog (reference
            # loader.py:166 reads tpcds.sfN.* from Trino's generator
            # catalog): rows computed at scan time from spark.range — no
            # storage, deterministic, parallel.  See sources/generator.py.
            from dblab_ece_trino_spark.sources.generator import gen_table

            df = gen_table(
                self.spark,
                spec.options.get("table", spec.table),
                sf=float(spec.options.get("sf", "1")),
            )
        elif spec.fmt in ("mongo", "es"):
            # Real-connector seam (reference values.yml.j2:40-61 runs the
            # Mongo + Elasticsearch Trino connectors).  The Spark-side
            # connector formats are public packages not bundled in this
            # container; the seam plumbs the TableSpec options straight
            # into the DataSource so a deployment that adds the package
            # gets the real scan (with its own filter pushdown) without
            # code changes.  Absent the package, Spark raises
            # DATA_SOURCE_NOT_FOUND, re-raised with deployment guidance;
            # the sanctioned parquet stand-in covers this container.
            fmt_name = "mongodb" if spec.fmt == "mongo" else "org.elasticsearch.spark.sql"
            pkg = (
                "org.mongodb.spark:mongo-spark-connector_2.13"
                if spec.fmt == "mongo"
                else "org.elasticsearch:elasticsearch-spark-30_2.13"
            )
            reader = self.spark.read.format(fmt_name)
            for k, v in spec.options.items():
                if k == "char_columns":
                    continue
                reader = reader.option(k, v)
            try:
                df = reader.load()
            except Exception as exc:  # connector jar not on the classpath
                raise NotImplementedError(
                    f"format {spec.fmt!r} needs the Spark connector package "
                    f"'{pkg}' on the classpath (spark-submit --packages); "
                    "in this container register the table as parquet "
                    "(the sanctioned stand-in)"
                ) from exc
        else:
            # Generic connector pass-through: any other fmt is handed to
            # Spark's DataSource resolution verbatim with the spec's
            # options (how a deployment registers e.g. a Delta/Iceberg/
            # vendor connector without engine changes).  Option plumbing
            # is unit-tested end-to-end via a Python DataSource
            # (tests/test_engine.py::test_connector_options_reach_reader).
            reader = self.spark.read.format(spec.fmt)
            for k, v in spec.options.items():
                if k == "char_columns":
                    continue
                reader = reader.option(k, v)
            try:
                df = reader.load(spec.path) if spec.path else reader.load()
            except Exception as exc:
                raise NotImplementedError(
                    f"table format {spec.fmt!r} is not a bundled format and "
                    "no Spark DataSource with that name is on the "
                    "classpath/registered (add the connector package via "
                    "spark-submit --packages or spark.dataSource.register)"
                ) from exc
        # Opt-in char(N) discipline (SURVEY §7.2): columns listed in the
        # 'char_columns' option (comma-separated) are rtrim-normalized at
        # scan time, so grouping / joins / set ops over blank-padded char
        # keys behave pad-insensitively like Trino's char comparison
        # (reference char cols: q003 explain.txt:6, q005 explain.txt:32).
        chars = spec.options.get("char_columns")
        if chars:
            from dblab_ece_trino_spark.functions.charn import normalize_char_columns

            df = normalize_char_columns(
                df, [c.strip() for c in chars.split(",") if c.strip()]
            )
        return df

    def register_generator_schema(self, sf: float = 1.0, catalog: str = "tpcds") -> None:
        """Register the full generator schema as ``tpcds.sfN.<table>`` —
        the reference's source catalog naming (loader.py:166)."""
        from dblab_ece_trino_spark.sources.generator import generator_tables

        # schema must stay a single identifier: sf1, sf10, sf0_1
        schema = f"sf{int(sf) if float(sf).is_integer() else str(sf).replace('.', '_')}"
        for t in generator_tables():
            self.register(
                TableSpec(
                    catalog, schema, t, "generator",
                    options={"table": t, "sf": str(sf)},
                )
            )

    #: The reference's LOADED placement: its loader CTASes every tpcds
    #: generator table into the three stores (data-loader/loader.py:313-322,
    #: job-loader-es.yaml:44-49) and the five queries address them there —
    #: ``psql.tpcds.<t>`` for dims + store fact/returns,
    #: ``mongodb.tpcds.catalog_sales``, ``elastic.default.tpcds_web_sales``.
    REFERENCE_TPCDS_PLACEMENT = {
        ("psql", "tpcds"): [
            ("store_sales", "store_sales"),
            ("store_returns", "store_returns"),
            ("reason", "reason"),
            ("customer", "customer"),
            ("customer_address", "customer_address"),
            ("date_dim", "date_dim"),
            ("item", "item"),
            ("store", "store"),
        ],
        ("mongodb", "tpcds"): [("catalog_sales", "catalog_sales")],
        ("elastic", "default"): [("tpcds_web_sales", "web_sales")],
    }

    def register_reference_tpcds(self, sf: float = 1.0) -> None:
        """Register the generator tables under the reference's exact
        federated 3-part names, so its five query files run through
        ``engine.sql`` byte-for-byte (queries/q001.sql..q005.sql)."""
        for (cat, schema), tables in self.REFERENCE_TPCDS_PLACEMENT.items():
            for name, gen_table in tables:
                self.register(
                    TableSpec(
                        cat, schema, name, "generator",
                        options={"table": gen_table, "sf": str(sf)},
                    )
                )

    def register_jdbc_dsv2_catalog(
        self,
        name: str,
        url: str,
        driver: str | None = None,
        options: dict[str, str] | None = None,
    ) -> None:
        """Register a REAL Spark DSv2 JDBC catalog (JDBCTableCatalog).

        This is the computation-pushdown path: unlike the V1
        ``format("jdbc")`` relation (filter/column pruning only), the DSv2
        catalog compiles aggregates and limits into the remote dialect —
        the engine-side analog of Trino's JDBC connector pushing a whole
        sum+filter into PostgreSQL (reference
        results/q001/workers-1/explain.txt:9).  Verified end-to-end on
        embedded Derby: the optimized plan's RelationV2 returns the
        aggregated columns and the formatted plan shows PushedAggregates
        (tests/test_jdbc.py).

        Tables resolve as native Spark 3-part names ``name.SCHEMA.TABLE``
        (no temp-view rewrite needed — the rewriter leaves unregistered
        names to Spark's own resolution, which finds this catalog).
        """
        conf = self.spark.conf
        conf.set(
            f"spark.sql.catalog.{name}",
            "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
        )
        conf.set(f"spark.sql.catalog.{name}.url", url)
        if driver:
            conf.set(f"spark.sql.catalog.{name}.driver", driver)
        conf.set(f"spark.sql.catalog.{name}.pushDownAggregate", "true")
        conf.set(f"spark.sql.catalog.{name}.pushDownLimit", "true")
        # Whole-join pushdown between relations of this catalog (needs the
        # session conf spark.sql.optimizer.datasourceV2JoinPushdown, set by
        # the engine builder/wrap).  Spark gates it per dialect — fires on
        # PostgreSQL (the reference's store) and MySQL/Oracle/MsSql/H2;
        # Derby (this container's embedded store) has no join SQL
        # generation, so the engine-side join runs there instead, with
        # filters still pushed per scan.
        conf.set(f"spark.sql.catalog.{name}.pushDownJoin", "true")
        for k, v in (options or {}).items():
            conf.set(f"spark.sql.catalog.{name}.{k}", v)

    def table(self, full_name: str) -> DataFrame:
        parts = full_name.split(".")
        if len(parts) != 3:
            raise ValueError(f"expected catalog.schema.table, got {full_name!r}")
        spec = self.lookup(*parts)
        if spec is None:
            raise KeyError(f"table not registered: {full_name}")
        return self.spark.table(spec.view_name)

    def all_tables(self) -> list[TableSpec]:
        return list(self._tables.values())

    # ------------------------------------------------- testdata conveniences
    TESTDATA_TABLES = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()

    #: Federation placement mirroring the reference (loader.py:313-322,
    #: job-loader-es.yaml:44-49): dims + the store fact in "psql", the
    #: catalog fact in "mongodb", the web fact in "elastic"; the LLM tables
    #: live in a lake catalog the reference has no analog for.
    REFERENCE_PLACEMENT = {
        "psql.tpch": ["region", "nation", "customer", "supplier", "part", "lineitem"],
        "mongodb.tpch": ["orders"],
        "elastic.default": ["events"],
        "lake.llm": ["documents", "embeddings"],
    }

    def register_sf_dir(self, sf_dir: str, plain_views: bool = True) -> None:
        """Register driver testdata under the reference-style catalogs.

        Also registers each table as a plain 1-part temp view (``lineitem``)
        so DataFrame-first code and the DuckDB oracle share table names.
        """
        for cat_schema, tables in self.REFERENCE_PLACEMENT.items():
            cat, schema = cat_schema.split(".")
            for t in tables:
                path = os.path.join(sf_dir, f"{t}.parquet")
                if os.path.exists(path):
                    self.register_parquet(cat, schema, t, path)
        if plain_views:
            for t in self.TESTDATA_TABLES:
                path = os.path.join(sf_dir, f"{t}.parquet")
                if os.path.exists(path):
                    self._read_parquet(path).createOrReplaceTempView(t)
