"""Time named queries with bench.py's exact protocol, in one session.

Usage: python tools/time_queries.py [--runs N] q1 q2 ...

Warm each plan at sf0.001, then time it at $SPARK_GRAFT_SF_DIR
(default sf0.1) through the noop sink; report the median of N runs
(default 3).  For optimization iteration only — the committed
before/after numbers come from bench.py / tools/bench_rebaseline.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEMORY", "16g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from blueforty___etl_data_pipeline_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    spark = get_spark(app_name="blueforty-time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1000000).selectExpr("sum(id)").collect()
    import glob as _g

    for p in _g.glob(os.path.join(sf_dir, "*.parquet")):
        spark.read.parquet(p).count()
    out: dict[str, float] = {}
    for name in args:
        fn = qs[name]
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        try:
            fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception as exc:
            print(f"WARM-FAIL {name}: {exc}", file=sys.stderr)
        samples = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
        out[name] = round(sorted(samples)[len(samples) // 2], 3)
        print(f"{name}: median={out[name]} runs={[round(s,3) for s in samples]}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
