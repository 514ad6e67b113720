"""sf1 spot bench: empirically confirm the documented scale shapes of
the slowest queries by timing them at sf0.1 and at the derived 10x
replica (tools/make_sf1.py -> .tmp/sf1).

A query whose plan is scale-safe should grow ~linearly (ratio around
10 or less once fixed per-query session costs amortize); a quadratic
candidate generator or single-partition window would show a ratio far
above 10.  Writes BENCH_sf1_spot.json at the repo root:
{query: {"sf01_sec": a, "sf1_sec": b, "ratio": b/a}, ...}.

Usage: python tools/bench_sf1_spot.py   (run make_sf1.py first)
"""

from __future__ import annotations

import json
import os

# Long single-JVM sweeps need the 16g heap (VERDICT r12 #1); the
# library default is 4g, so sweep entry points scope the bump here.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEMORY", "16g")
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: the slowest plans per VERDICT r4's audit: streaming machinery,
#: exact-verification shingle joins, Expand-heavy profiling, and the
#: bounded iterative loops — plus the composed pipelines.
SLOW_SET = [
    "streaming_join",
    "containment_pairs",
    "lsh_recall",
    "profile_table",
    "power_iteration",
    "kmeans_train",
    "bpe_train",
    "streaming_session",
    "streaming_user_stats",
    "minhash_lsh_pairs",
    "tokenize_pack",
    "training_pipeline",
    "dedup_report",
    "semantic_dedup",
    # round-5 session additions worth a scale datapoint: the
    # mapInPandas-heavy image pipeline and the composed epoch job
    "image_dhash_pairs",
    "epoch_pipeline",
    "record_linkage",
    # round-6 extension (VERDICT r5 item 6): the remaining round-5
    # additions with nontrivial scale shapes
    "ivf_pq_search",
    "image_dedup",
    "frequent_pairs",
    "cdc_rollup",
    # round-6 additions with joins/iterative shapes worth a datapoint
    "triangle_count",
    "corr_matrix",
    "jpeg_progressive_real",
    # round-6 session-2 additions: sketch builds over the full fact
    # table, permutation fan-out, token-stream projection, iterative
    # graph peel, pre-agg + self-join stats
    "cms_frequency",
    "kmv_distinct",
    "permutation_test",
    "hashed_features",
    "k_core",
    "acf_daily",
    "jackknife_se",
    # round-8 extension (VERDICT r6 item 6): remaining round-6
    # scale-sensitive additions — grid-bucketed DBSCAN, model train +
    # broadcast inference, graph feature join, islands window, WARC
    # container roundtrip; plus the new MP4 sample-table walk
    "density_clusters",
    "naive_bayes",
    "link_prediction",
    "merge_intervals",
    "warc_roundtrip",
    "mp4_frames_real",
    # round-9 additions with shuffle/join shapes worth a datapoint:
    # the shingle min-id pass, the DSIR explode→broadcast scoring, the
    # Bloom probe legs, and the per-key lateness window
    "ngram_novelty",
    "dsir_importance",
    "bloom_semi_join",
    "lateness_profile",
    # round-10 additions with shuffle/explode/group shapes worth a
    # datapoint: the distributed global rank, winnowing explode +
    # distinct, per-group container assembly, blocked margin mining,
    # and the shuffle-layout audit
    "global_rank",
    "winnow_fingerprints",
    "tfrecord_roundtrip",
    "pcap_extract",
    "bitext_mine",
    "shuffle_quality",
    "rfm_segments",
    "cdc_chunks",
    "quantile_normalize",
    "maxsim_retrieval",
    # round-11 additions: chunked prefix-min skyline, iterative LPA
    "skyline",
    "label_propagation",
    "sorted_neighborhood",
]


def main() -> None:
    sf1_dir = os.path.join(REPO, ".tmp", "sf1")
    if not os.path.isdir(sf1_dir):
        sys.exit("run tools/make_sf1.py first")

    import __spark_entry__ as entrymod
    from blueforty___etl_data_pipeline_spark.session import get_spark

    # 10x data in a single local JVM needs a real heap (the default
    # local-mode 1g is a laptop setting, not the 128 GiB box this
    # runs on); on a cluster this is spark.executor.memory territory.
    spark = get_spark(
        app_name="bench-sf1-spot",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1000000).selectExpr("sum(id)").collect()

    out = {}
    for name in SLOW_SET:
        fn = qs[name]
        try:  # warm plan/codegen at the smallest scale
            fn(spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception:
            pass
        t0 = time.time()
        fn(spark, "/root/testdata/sf0.1").write.mode("overwrite").format(
            "noop"
        ).save()
        a = time.time() - t0
        t0 = time.time()
        fn(spark, sf1_dir).write.mode("overwrite").format("noop").save()
        b = time.time() - t0
        out[name] = {
            "sf01_sec": round(a, 3),
            "sf1_sec": round(b, 3),
            "ratio": round(b / a, 2),
        }
        print(name, out[name], flush=True)

    path = os.path.join(REPO, "BENCH_sf1_spot.json")
    with open(path, "w") as f:
        json.dump(
            {
                "note": (
                    "sf1 is a derived 10x key-shifted replica of the "
                    "driver's sf0.1 fixtures (tools/make_sf1.py); "
                    "ratio ~10 or less = no super-linear blowup"
                ),
                "queries": out,
            },
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
