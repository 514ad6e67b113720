"""JDBC extraction (reference: Postgres → CSV → stage → COPY,
BlueForty.py:312-360).

The reference round-trips the supplier table through a local CSV file.  In
Spark the whole detour disappears: ``spark.read.format("jdbc")`` scans the
table directly, and with ``partitionColumn/lowerBound/upperBound/
numPartitions`` the extract is executor-parallel instead of a single-client
``COPY TO STDOUT``.  No JDBC endpoint exists in this test environment, so
this module only builds the reader config (exercised in tests for options
plumbing); the fixture path reads Parquet instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    driver: str | None = None,
):
    """Configured DataFrameReader for a parallel JDBC extract.

    At scale: always supply the partition bounds — a boundless JDBC read is
    a single-task scan no matter how big the cluster.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if driver is not None:
        reader = reader.option("driver", driver)
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader


def read_jdbc_table(spark: SparkSession, url: str, table: str, **kwargs) -> DataFrame:
    return jdbc_reader(spark, url, table, **kwargs).load()
