"""Controlled bench re-baseline (VERDICT r8 item 3): run the full
bench N times, each in a FRESH process/JVM (cold session — no
in-session accumulation, no shared JIT/metaspace state), and commit
the per-query MEDIANS as BENCH_FULL.json plus a delta report against
a reference artifact.

Protocol:
- each run is ``python bench.py`` in its own subprocess; the runs are
  strictly sequential so they never contend for cores;
- the per-run payloads land in .tmp/rebaseline/run{i}.json (bench.py
  itself writes BENCH_FULL.json last-run-wins; we re-read and replace
  it with medians at the end);
- the committed BENCH_FULL.json gets a ``protocol`` block recording
  run count, per-run totals, and the max per-query spread so future
  rounds can tell drift from regression.

Usage: python tools/bench_rebaseline.py [n_runs] [ref_json] [round]
       (defaults: 3 runs, ref = .tmp/bench_r7.json if present,
        round = 13 — controls the BENCH_MEDIANS_r{N}.json /
        BENCH_DELTA_r{N}_rebaseline.md artifact names)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ref_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".tmp", "bench_r7.json"
    )
    rnd = int(sys.argv[3]) if len(sys.argv) > 3 else 13
    out_dir = os.path.join(REPO, ".tmp", "rebaseline")
    os.makedirs(out_dir, exist_ok=True)

    runs: list[dict] = []
    for i in range(n_runs):
        print(f"=== run {i + 1}/{n_runs} (fresh process) ===", flush=True)
        log = os.path.join(out_dir, f"run{i}.log")
        with open(log, "w") as lf:
            subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                cwd=REPO,
                stdout=lf,
                stderr=subprocess.STDOUT,
                check=True,
            )
        with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
            payload = json.load(f)
        with open(os.path.join(out_dir, f"run{i}.json"), "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        runs.append(payload)
        print(f"run {i + 1}: total {payload['value']}s", flush=True)

    names = sorted(runs[0]["queries"])
    medians = {
        n: round(statistics.median(r["queries"][n] for r in runs), 3)
        for n in names
    }
    spreads = {
        n: round(
            max(r["queries"][n] for r in runs)
            - min(r["queries"][n] for r in runs),
            3,
        )
        for n in names
    }
    total = round(sum(medians.values()), 3)
    final = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": medians,
        "sf": runs[0]["sf"],
        "protocol": {
            "kind": "median_of_fresh_sessions",
            "head_commit": subprocess.run(
                ["git", "rev-parse", "HEAD"], cwd=REPO,
                capture_output=True, text=True,
            ).stdout.strip(),
            "n_runs": n_runs,
            "run_totals": [r["value"] for r in runs],
            "max_query_spread_sec": max(spreads.values()),
            "widest_queries": dict(
                sorted(spreads.items(), key=lambda kv: -kv[1])[:5]
            ),
        },
    }
    with open(os.path.join(REPO, "BENCH_FULL.json"), "w") as f:
        json.dump(final, f, indent=1, sort_keys=True)
        f.write("\n")
    with open(os.path.join(REPO, f"BENCH_MEDIANS_r{rnd}.json"), "w") as f:
        json.dump(final, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"median total: {total}s over {len(names)} queries")

    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        common = sorted(set(names) & set(ref["queries"]))
        now_c = sum(medians[n] for n in common)
        ref_c = sum(ref["queries"][n] for n in common)
        worst = sorted(
            (
                (medians[n] / ref["queries"][n], n, ref["queries"][n],
                 medians[n])
                for n in common
                if ref["queries"][n] >= 0.2
            ),
            reverse=True,
        )[:15]
        lines = [
            f"# Bench re-baseline delta (round {rnd})",
            "",
            f"Protocol: median of {n_runs} sequential FRESH-process runs "
            f"of the full bench at sf{runs[0]['sf']} "
            "(tools/bench_rebaseline.py); per-run payloads in "
            ".tmp/rebaseline/.",
            "",
            f"- run totals: "
            f"{', '.join(str(r['value']) for r in runs)} s",
            f"- committed median total: {total} s over {len(names)} queries",
            f"- common-{len(common)} subset vs reference "
            f"({os.path.basename(ref_path)}): {now_c:.1f}s vs "
            f"{ref_c:.1f}s = {now_c / ref_c:.2f}x",
            f"- max per-query spread across runs: "
            f"{max(spreads.values())}s",
            "",
            "Worst per-query ratios vs reference (ref >= 0.2s):",
            "",
            "| query | ref s | median s | ratio |",
            "|---|---|---|---|",
        ]
        for ratio, n, rv, mv in worst:
            lines.append(f"| {n} | {rv} | {mv} | {ratio:.2f} |")
        with open(os.path.join(REPO, f"BENCH_DELTA_r{rnd}_rebaseline.md"), "w") as f:
            f.write("\n".join(lines) + "\n")
        print(
            f"common-{len(common)}: {now_c:.1f}s vs {ref_c:.1f}s "
            f"({now_c / ref_c:.2f}x) -> BENCH_DELTA_r{rnd}_rebaseline.md"
        )


if __name__ == "__main__":
    main()
