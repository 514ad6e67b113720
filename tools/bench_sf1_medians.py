"""Committed sf1 median baseline (VERDICT r10 item 5): promote the 10×
replica from per-item spot-checks to a standing measured artifact.

Takes the TOP-N queries by sf0.1 median wall time (from
BENCH_MEDIANS_r10.json — the committed fresh-session medians), runs
them at the derived sf1 replica (tools/make_sf1.py → .tmp/sf1) in
N_RUNS fresh processes (one JVM per run, strictly sequential, the
bench_rebaseline protocol), and commits per-query MEDIANS plus a
protocol block and the sf0.1-median ratio per query to
BENCH_SF1_MEDIANS.json.  Future rounds diff against this instead of
re-arguing each query's scale shape from one-shot numbers.

Usage: python tools/bench_sf1_medians.py [n_runs] [top_n]
       python tools/bench_sf1_medians.py --child <out.json> <names...>
"""

from __future__ import annotations

import json
import os

# Long single-JVM sweeps need the 16g heap (VERDICT r12 #1); the
# library default is 4g, so sweep entry points scope the bump here.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEMORY", "16g")
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = os.path.join(REPO, ".tmp", "sf1")
OUT = os.path.join(REPO, "BENCH_SF1_MEDIANS.json")


def _latest_medians() -> str:
    """Newest committed fresh-session median file (numeric round order
    — lexical sort puts r9 after r10)."""
    import glob
    import re

    cands = sorted(
        glob.glob(os.path.join(REPO, "BENCH_MEDIANS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    if not cands:
        sys.exit("no BENCH_MEDIANS_r*.json found")
    return cands[-1]


def child(out_path: str, names: list[str]) -> None:
    import __spark_entry__ as entrymod
    from blueforty___etl_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="bench-sf1-medians",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1000000).selectExpr("sum(id)").collect()
    out = {}
    for name in names:
        fn = qs[name]
        try:  # warm plan/codegen at the smallest scale
            fn(spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception:
            pass
        t0 = time.time()
        try:
            fn(spark, SF1_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as exc:  # record the gate/failure, keep going
            out[name] = f"ERR {type(exc).__name__}: {exc}"[:300]
            print(name, out[name], flush=True)
            continue
        out[name] = round(time.time() - t0, 3)
        print(name, out[name], flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3:])
        return
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    if not os.path.isdir(SF1_DIR):
        sys.exit("run tools/make_sf1.py first")
    ref_path = _latest_medians()
    with open(ref_path) as f:
        ref = json.load(f)
    names = sorted(ref["queries"], key=ref["queries"].get, reverse=True)[
        :top_n
    ]
    out_dir = os.path.join(REPO, ".tmp", "sf1_medians")
    os.makedirs(out_dir, exist_ok=True)
    runs: list[dict] = []
    for i in range(n_runs):
        print(f"=== sf1 run {i + 1}/{n_runs} (fresh process) ===", flush=True)
        rp = os.path.join(out_dir, f"run{i}.json")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", rp]
            + names,
            cwd=REPO,
            check=True,
        )
        with open(rp) as f:
            runs.append(json.load(f))
    errs = {
        n: next(r[n] for r in runs if isinstance(r[n], str))
        for n in names
        if any(isinstance(r[n], str) for r in runs)
    }
    names = [n for n in names if n not in errs]
    medians = {
        n: round(statistics.median(r[n] for r in runs), 3) for n in names
    }
    spreads = {
        n: round(max(r[n] for r in runs) - min(r[n] for r in runs), 3)
        for n in names
    }
    widest = dict(
        sorted(spreads.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    payload = {
        "metric": f"top{top_n}_sf1_median_wall",
        "unit": "sec",
        "sf": "sf1 (10x key-shifted replica of sf0.1, tools/make_sf1.py)",
        "value": round(sum(medians.values()), 3),
        "queries": medians,
        "errors": errs,
        "ratio_vs_sf01_median": {
            n: round(medians[n] / ref["queries"][n], 2) for n in names
        },
        "protocol": {
            "kind": "median_of_fresh_sessions",
            "n_runs": n_runs,
            "selection": f"top {len(names)} by "
            f"{os.path.basename(ref_path)} sf0.1 median wall",
            "run_totals": [
                round(sum(r[n] for n in names), 3) for r in runs
            ],
            "max_query_spread_sec": max(spreads.values()),
            "widest_queries": widest,
        },
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: total {payload['value']}s")


if __name__ == "__main__":
    main()
