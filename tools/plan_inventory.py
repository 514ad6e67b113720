"""Inventory physical-plan shapes for every benched query.

For each HEADLINE query: build the DataFrame at sf0.1, format the plan,
and record operator counts (scans, exchanges, python nodes, joins).
Output: .tmp/plan_inventory.json.  Counts use the tree section only
(formatted explain lists each node twice — tree + details).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEMORY", "16g")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entrymod
from blueforty___etl_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="blueforty-plan-inventory")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    names = sys.argv[1:] or bench.HEADLINE
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        tree = text.split("\n\n")[0]
        out[name] = {
            "build_s": round(time.time() - t0, 2),
            "scans": len(re.findall(r"Scan parquet", tree)),
            "exchanges": len(re.findall(r"\bExchange\b", tree)),
            "reused": len(re.findall(r"ReusedExchange", tree)),
            "python": len(
                re.findall(
                    r"BatchEvalPython|ArrowEvalPython|MapInArrow|"
                    r"MapInPandas|FlatMapGroupsInPandas",
                    tree,
                )
            ),
            "smj": len(re.findall(r"SortMergeJoin", tree)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", tree)),
            "cartesian": len(re.findall(r"CartesianProduct", tree)),
            "sorts": len(re.findall(r"\bSort\b", tree)),
            "lines": tree.count("\n") + 1,
        }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp",
        "plan_inventory.json",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(path)
    spark.stop()


if __name__ == "__main__":
    main()
