"""Table catalog over the driver's synthetic Parquet tables.

The reference's namespace DDL (CREATE DATABASE/SCHEMA, BlueForty.py:15-19)
maps to Spark catalog databases; for this project the tables are plain
Parquet files registered as temp views — Catalyst still gets full predicate
pushdown, column pruning, and stats from the Parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table.  Plain columnar scan: filters and column
    selections applied by the caller reach the Parquet reader (verify with
    ``.explain`` → ``PushedFilters`` / ``ReadSchema``).

    ``events`` needs special handling: some generations of the fixture
    store ``ts`` as parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    read natively (PARQUET_TYPE_ILLEGAL).  We enable the legacy
    nanos-as-long conf before reading and then normalize on the OBSERVED
    dtype: a bigint ``ts`` (nanos fixture) is truncated to a microsecond
    timestamp — integer ``div`` (not ``/``, which is a double division
    and loses precision past 2^53) so the value agrees bit-for-bit with
    engines that truncate ns→µs; a native timestamp ``ts`` (micros
    fixture) passes through untouched.  Keying on the read schema rather
    than an assumed physical type keeps the loader correct across
    fixture regenerations.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            # Micros fixture without UTC-adjustment flag: wall-clock
            # values ARE UTC instants here.  Cast to TIMESTAMP (LTZ) —
            # watermarks/F.window event time and unix_micros require LTZ
            # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise).  The cast
            # is only correct under a UTC session zone; that invariant is
            # established once at session construction (session.py /
            # _prep), never mutated here — a loader that silently flips a
            # session-wide conf changes timestamp semantics for every
            # other query in the session.
            tz = spark.conf.get("spark.sql.session.timeZone")
            if tz != "UTC":
                raise RuntimeError(
                    "load_table('events') requires "
                    f"spark.sql.session.timeZone=UTC (got {tz!r}); build "
                    "the session with session.get_spark() or set the conf "
                    "before loading."
                )
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ensure_namespace(spark: SparkSession, database: str) -> None:
    """Namespace DDL (S12): CREATE DATABASE IF NOT EXISTS + USE
    (BlueForty.py:15-19, :205).  With a metastore this creates a real
    catalog database; sinks.save_as_table can then target
    ``db.table``."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    spark.catalog.setCurrentDatabase(database)


def register_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every synthetic table as a temp view (the Spark analog of
    the reference's CREATE DATABASE/SCHEMA + per-table DDL)."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
