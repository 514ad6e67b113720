"""Isolated fresh-session sf1 recheck (VERDICT r10 item 1).

The in-sequence sf1 spot bench (tools/bench_sf1_spot.py) runs ~50
queries through ONE long-lived JVM; late entries absorb accumulated
single-JVM drift (codegen cache pressure, GC debt, shuffle-file
accumulation) that BENCH_DELTA_r9.md quantified.  A ratio measured
that way is an upper bound, not a scale shape.  This tool re-measures
named queries the way corr_matrix/density_clusters were adjudicated in
round 10: ONE fresh subprocess (fresh JVM) per query, warm at
sf0.001, time sf0.1 then sf1, and merge the result into
BENCH_sf1_spot.json under "recheck_isolated".

Usage:
    python tools/recheck_isolated.py q1 q2 ...
    python tools/recheck_isolated.py --child <name>   (internal)
"""

from __future__ import annotations

import json
import os

# Long single-JVM sweeps need the 16g heap (VERDICT r12 #1); the
# library default is 4g, so sweep entry points scope the bump here.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEMORY", "16g")
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = os.path.join(REPO, ".tmp", "sf1")
SPOT_PATH = os.path.join(REPO, "BENCH_sf1_spot.json")


def child(name: str) -> None:
    import __spark_entry__ as entrymod
    from blueforty___etl_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"recheck-{name}",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = entrymod.queries()[name]
    spark.range(1000000).selectExpr("sum(id)").collect()
    try:  # warm plan/codegen at the smallest scale
        fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()
    except Exception:
        pass
    t0 = time.time()
    fn(spark, "/root/testdata/sf0.1").write.mode("overwrite").format(
        "noop"
    ).save()
    a = time.time() - t0
    t0 = time.time()
    fn(spark, SF1_DIR).write.mode("overwrite").format("noop").save()
    b = time.time() - t0
    print(
        "RESULT " + json.dumps({"sf01_sec": round(a, 3), "sf1_sec": round(b, 3)}),
        flush=True,
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: recheck_isolated.py <query> [...]")
    with open(SPOT_PATH) as f:
        spot = json.load(f)
    for name in names:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("RESULT ")),
            None,
        )
        if line is None:
            print(f"{name}: FAILED\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
            continue
        r = json.loads(line[len("RESULT "):])
        r["ratio"] = round(r["sf1_sec"] / r["sf01_sec"], 2)
        r["note"] = (
            "round-11 isolated fresh-session recheck (VERDICT r10 item 1): "
            "one fresh JVM per query, warm at sf0.001"
        )
        spot["queries"].setdefault(name, {})["recheck_isolated"] = r
        print(name, r, flush=True)
        with open(SPOT_PATH, "w") as f:
            json.dump(spot, f, indent=1, sort_keys=True)
            f.write("\n")
    print(f"merged into {SPOT_PATH}")


if __name__ == "__main__":
    main()
