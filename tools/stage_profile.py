"""Per-stage wall profile for named queries via the Spark event log.

Runs each query once (bench warm-then-measure protocol) in a session
with eventLog enabled, then parses the log: per-stage submit→complete
wall, task counts, and shuffle bytes — the no-UI route to "where does
the time go" (guide §7.1/§7.2).

Usage: [SPARK_GRAFT_CPUS=8] python tools/stage_profile.py q1 [q2 ...]
Output: .tmp/stage_profile_<cpus>.json + stdout summary.
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    log_dir = os.path.join(REPO, ".tmp", "eventlogs")
    os.makedirs(log_dir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="blueforty-stage-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    qs = entrymod.queries()
    spark.range(1000000).selectExpr("sum(id)").collect()
    spans: dict[str, tuple[float, float]] = {}
    for name in names:
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        try:
            qs[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as exc:
            print(f"WARM-FAIL {name}: {exc}", file=sys.stderr)
        t0 = time.time() * 1000
        qs[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        t1 = time.time() * 1000
        spans[name] = (t0, t1)
        print(f"{name}: {(t1 - t0) / 1000:.3f}s", flush=True)
    spark.stop()

    # parse the event log (Spark 4: rolling dir eventlog_v2_<appid>)
    cands = [p for p in os.listdir(log_dir) if app_id in p]
    log_path = os.path.join(log_dir, cands[0])
    if os.path.isdir(log_path):
        files = sorted(
            os.path.join(log_path, f)
            for f in os.listdir(log_path)
            if f.startswith("events_")
        )
    else:
        files = [log_path]
    lines: list[str] = []
    for fp in files:
        with open(fp) as f:
            lines.extend(f)
    stages: list[dict] = []
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None:
                    continue
                stages.append(
                    {
                        "stage": si["Stage ID"],
                        "name": si["Stage Name"].split("\n")[0][:80],
                        "tasks": si["Number of Tasks"],
                        "wall_ms": comp - sub,
                        "sub": sub,
                        "comp": comp,
                    }
                )
    out: dict[str, list[dict]] = {}
    for name, (t0, t1) in spans.items():
        mine = [
            s for s in stages if s["sub"] >= t0 - 50 and s["comp"] <= t1 + 50
        ]
        mine.sort(key=lambda s: -s["wall_ms"])
        out[name] = mine
        total = sum(s["wall_ms"] for s in mine)
        print(f"\n== {name}: {len(mine)} stages, stage-wall sum "
              f"{total / 1000:.2f}s (overlap possible)")
        for s in mine[:12]:
            print(f"  {s['wall_ms']:6d} ms  {s['tasks']:4d} tasks  "
                  f"s{s['stage']}  {s['name']}")
    with open(
        os.path.join(REPO, ".tmp", f"stage_profile_c{cpus}.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
