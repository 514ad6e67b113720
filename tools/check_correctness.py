"""Local differential harness mimicking the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then compares:

- row count
- column names (sorted)
- order-insensitive value hash (rows canonicalized to strings, sorted)

Usage:  python tools/check_correctness.py [--bare] [sf_dir] [query ...]

``--bare`` runs against a plain ``SparkSession.builder.getOrCreate()``
with none of the engine factory's configs — exactly how the driver calls
the contract; every query must self-provision its session needs via
``_prep``.
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

REPO = "/root/repo"
sys.path.insert(0, REPO)


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return sorted(cols), h


def main() -> None:
    args = sys.argv[1:]
    bare = "--bare" in args
    if bare:
        args.remove("--bare")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb

    import __spark_entry__ as entrymod

    if bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-correctness-bare")
            .getOrCreate()
        )
    else:
        from blueforty___etl_data_pipeline_spark.session import get_spark

        spark = get_spark(app_name="check-correctness")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = list(ores.columns)
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sh = canon_rows(scols, srows)
        oc, oh = canon_rows(ocols, orows)
        ok_n = len(srows) == len(orows)
        ok_c = sc == oc
        ok_h = sh == oh
        if ok_n and ok_c and ok_h:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: rows {len(srows)} vs {len(orows)} "
                f"cols_match={ok_c} hash_match={ok_h}"
            )
            if not ok_c:
                print(f"  spark cols:  {sc}\n  oracle cols: {oc}")
            elif not ok_h:
                # show first differing canonical rows
                sset = set()
                order = sorted(range(len(sc)), key=lambda i: sc[i])
                slines = sorted(
                    "\x01".join(_canon_value(r[i]) for i in order) for r in srows
                )
                olines = sorted(
                    "\x01".join(_canon_value(r[i]) for i in order) for r in orows
                )
                for a, b in zip(slines, olines):
                    if a != b:
                        print(f"  spark:  {a[:200]}\n  oracle: {b[:200]}")
                        break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
