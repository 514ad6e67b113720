"""Similarity-search operators over embedding columns."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot,
)
from blueforty___etl_data_pipeline_spark.operators.similarity import (
    ann_brute_force,
    ann_lsh_bucketed,
    score_batch_numpy,
)
from blueforty___etl_data_pipeline_spark.sources.catalog import load_table


def test_dot_and_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    r = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        cosine_similarity(F.col("a"), F.col("a")).alias("self"),
    ).collect()[0]
    assert r["d"] == 32.0
    assert abs(r["self"] - 1.0) < 1e-12


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0])], "a array<double>, b array<double>"
    )
    assert df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"] is None


def test_brute_force_self_is_nearest(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = ann_brute_force(emb, queries, k=1)
    for r in out.collect():
        assert r["neighbor_id"] == r["query_id"]  # cosine(self)=1 is max
        assert r["rank"] == 1


def test_lsh_results_subset_of_brute_force_order(spark, sf_small):
    # LSH scores only same-bucket pairs; every returned (q, n, score) must
    # match the brute-force score exactly (same fold, same rounding).
    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") % 250 == 0)
    bf = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in ann_brute_force(emb, queries, k=500).collect()
    }
    for r in ann_lsh_bucketed(emb, queries, k=5).collect():
        assert bf[(r["query_id"], r["neighbor_id"])] == r["score"]


def test_ann_recall_floor(spark, sf_small):
    # Retrieval QUALITY, not just determinism: recall@5 of each approx
    # path against exact brute force must clear a stated floor on the
    # fixture.  Knobs measured on sf0.001 (500 random vectors): LSH
    # recall falls as n_planes rises (2→0.60, 4→0.36, 8→0.20 — random
    # vectors have weak neighbor structure, so fine buckets separate
    # true neighbors); IVF nprobe=2 achieves 1.0.  The test pins
    # n_planes=4 / nprobe=2 with floors at half the observed values —
    # the assert catches a bucketing regression, not fixture noise.
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        ann_ivf,
    )

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_brute_force(emb, queries, k=5).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_bucketed(emb, queries, k=5, n_planes=4).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf(
            emb, queries, k=5, centroid_stride=50, nprobe=2
        ).collect()
    }
    assert len(lsh & exact) / len(exact) >= 0.18
    assert len(ivf & exact) / len(exact) >= 0.5
    # self-retrieval: every query must find itself through either path
    for approx in (lsh, ivf):
        assert all(
            (q, q) in approx for q, _ in exact if (q, q) in exact
        )


def test_numpy_batch_scorer_matches_fold(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings").limit(50).cache()
    qrows = [(int(r["vec_id"]), list(r["embedding"])) for r in emb.limit(2).collect()]
    fast = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in score_batch_numpy(emb, qrows).collect()
    }
    q = spark.createDataFrame(qrows, "vec_id long, embedding array<float>")
    slow = ann_brute_force(emb, q, k=50, round_decimals=6)
    for r in slow.collect():
        assert abs(fast[(r["query_id"], r["neighbor_id"])] - r["score"]) < 1e-6


def test_ivf_scores_match_brute_force(spark, sf_small):
    # IVF probes a subset of cells; every returned (query, neighbor, score)
    # must carry the exact brute-force score, and the self-match must be
    # found (a query's own vector lives in its nearest cell).
    from blueforty___etl_data_pipeline_spark.operators.similarity import ann_ivf

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") % 250 == 0)
    bf = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in ann_brute_force(emb, queries, k=500, round_decimals=6).collect()
    }
    rows = ann_ivf(emb, queries, centroid_stride=100, nprobe=2).collect()
    assert len(rows) > 0
    self_found = set()
    for r in rows:
        assert bf[(r["query_id"], r["neighbor_id"])] == r["score"]
        if r["query_id"] == r["neighbor_id"]:
            self_found.add(r["query_id"])
    assert self_found == {r["query_id"] for r in rows}


def test_assign_nearest_centroid_matches_numpy(spark):
    import numpy as np

    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        assign_nearest_centroid,
    )
    from blueforty___etl_data_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = emb.filter("vec_id % 100 = 0")
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_nearest_centroid(emb, cents, round_decimals=6).collect()
    }

    rows = emb.collect()
    C = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
         for r in rows if r["vec_id"] % 100 == 0}
    assert len(got) == len(rows)
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        best = min(
            (
                (-round(float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c))), 6), cid)
                for cid, c in C.items()
            ),
        )[1]
        assert got[r["vec_id"]] == best, r["vec_id"]


def test_assign_nearest_centroid_self_assignment(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        assign_nearest_centroid,
    )
    from blueforty___etl_data_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = emb.filter("vec_id % 100 = 0")
    out = assign_nearest_centroid(emb, cents)
    # every centroid is its own nearest centroid (cosine 1.0 with itself)
    own = out.filter("vec_id % 100 = 0").collect()
    assert own and all(r["vec_id"] == r["centroid_id"] for r in own)


def test_quantize_embeddings_error_bound_and_numpy_parity(spark):
    import math

    import numpy as np

    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )
    from blueforty___etl_data_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    src = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in emb.collect()}
    assert rows.keys() == {k for k, v in src.items() if np.abs(v).max() > 0}
    for vid, r in rows.items():
        v = src[vid]
        scale = float(np.abs(v).max())
        q = np.floor(v / scale * 127)
        assert r["scale_micros"] == math.floor(scale * 1e6)
        assert r["q_sum"] == int(q.sum())
        assert r["n_sat"] == int((np.abs(q) == 127).sum())
        # worst-case reconstruction error of floor-quantization < 1 step
        assert r["max_err_micros"] <= math.floor(scale / 127 * 1e6) + 1
        assert r["n_sat"] >= 1  # the max-|x| element saturates by construction


def test_kmeans_lloyd_converges_to_cluster_means(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        kmeans_lloyd,
    )

    # two tight direction-clusters; seeds 0 and 10 start one in each
    near_x = [[1.0, 0.0, 0.0, 0.0], [0.9, 0.1, 0.0, 0.0], [0.8, 0.2, 0.0, 0.0]]
    near_y = [[0.0, 1.0, 0.0, 0.0], [0.1, 0.9, 0.0, 0.0], [0.0, 0.8, 0.2, 0.0]]
    rows = [(i, v) for i, v in enumerate(near_x)] + [
        (10 + i, v) for i, v in enumerate(near_y)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = df.filter((F.col("vec_id") == 0) | (F.col("vec_id") == 10))
    out = {
        r["centroid_id"]: r for r in kmeans_lloyd(df, cents, iters=2).collect()
    }
    assert set(out) == {0, 10}
    assert out[0]["n_members"] == 3 and out[10]["n_members"] == 3
    # centroid 0 is the exact integer-micros mean of the x-cluster:
    # floor((1.0+0.9+0.8)e6/3) + floor((0+0.1+0.2)e6/3) = 900000 + 100000
    assert out[0]["centroid_sum"] == 1_000_000


def test_ivf_index_probe_matches_in_memory_and_prunes(spark, sf_small, tmp_path):
    # The persisted index must reproduce ann_ivf bit-for-bit, and the
    # probe scan must be restricted to the probed cells via dynamic
    # partition pruning on the centroid_id Hive partition column.
    import contextlib
    import io

    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        ann_ivf,
        build_ivf_index,
        probe_ivf_index,
    )

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, centroid_stride=50)
    probed = probe_ivf_index(spark, path, queries, k=5, nprobe=2)
    direct = ann_ivf(emb, queries, k=5, centroid_stride=50, nprobe=2)
    assert sorted(map(tuple, probed.collect())) == sorted(
        map(tuple, direct.collect())
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    assert "dynamicpruning" in buf.getvalue().lower()


def test_rrf_fuse_combines_lists_exactly(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        rrf_fuse,
    )

    schema = "query_id long, neighbor_id long, rank int"
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], schema
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], schema
    )
    out = {r["neighbor_id"]: r for r in rrf_fuse([a, b], k=4).collect()}
    # 11 appears in both lists: 1e6//62 + 1e6//61 = 16129 + 16393
    assert out[11]["rrf_score"] == 16129 + 16393
    assert out[11]["n_lists"] == 2 and out[11]["rank"] == 1
    # singles: 10 (rank1 in a) = 1e6//61; 13 (rank2 in b) = 1e6//62
    assert out[10]["rrf_score"] == 16393
    assert out[13]["rrf_score"] == 16129
    assert out[12]["rrf_score"] == 1000000 // 63
    # tie between 10... no tie here: full order 11 > 10 > 13 > 12
    ranks = {nid: r["rank"] for nid, r in out.items()}
    assert ranks == {11: 1, 10: 2, 13: 3, 12: 4}


def test_semantic_dedup_greedy_keep_rule(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    # Two well-separated clusters on orthogonal axes.  Cluster A holds an
    # exact-dup chain (ids 1, 2) plus a dissimilar-enough member (id 3);
    # cluster B holds a singleton (id 10).  Greedy rule: drop iff cosine
    # >= threshold to ANY lower id in the cluster.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),        # dup of 1 -> dropped
        (3, [0.5, 0.0, 0.9]),        # cos to 1 = 0.486 < 0.5 -> kept
        (10, [0.0, 1.0, 0.0]),       # own cluster, singleton -> kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (10, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: (r["centroid_id"], r["keep"])
        for r in semantic_dedup(emb, cents, threshold=0.5).collect()
    }
    assert out == {1: (1, True), 2: (1, False), 3: (1, True), 10: (10, True)}


def test_semantic_dedup_cluster_cap_degenerate_cell(spark):
    """max_cluster_size on a degenerate one-cluster fixture (VERDICT
    r10 item 3): the capped path compares each vector only against the
    cluster's ``cap`` lowest-id members, so a dup whose ONLY similar
    lower-id mate ranks past the cap is kept — and the exact
    ``None`` form still drops it.  Under-cap clusters are identical
    either way."""
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    # one centroid -> one cluster of four; v4 is an exact dup of v3,
    # but v3 ranks 3rd by id (past cap=2); v4 vs v1/v2 stays below 0.9
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [0.6, 0.8]),
        (4, [0.6, 0.8]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    exact = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            emb, cents, threshold=0.9, max_cluster_size=None
        ).collect()
    }
    assert exact == {1: True, 2: True, 3: True, 4: False}
    capped = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            emb, cents, threshold=0.9, max_cluster_size=2
        ).collect()
    }
    assert capped == {1: True, 2: True, 3: True, 4: True}
    # a cap at or above the cluster size is bit-identical to exact
    at_cap = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            emb, cents, threshold=0.9, max_cluster_size=4
        ).collect()
    }
    assert at_cap == exact


def test_ann_lsh_multitable_recall_dominates_single(spark, sf_small):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        ann_lsh_multitable,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_brute_force(emb, queries, k=5, round_decimals=6).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_bucketed(
            emb, queries, k=5, n_planes=8, dim=64, round_decimals=6
        ).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_multitable(
            emb, queries, k=5, n_planes=8, n_tables=3, round_decimals=6
        ).collect()
    }
    # OR-amplification can only help: multi-table recall vs the exact
    # top-5 is >= the single-table recall (table 0 IS the single table)
    assert len(multi & exact) >= len(single & exact)
    # and every returned pair is a genuine scored candidate (precision
    # stays exact): scores come from the same rounded cosine, so any
    # pair also in the exact set must carry identical rank semantics
    assert multi  # non-degenerate


def test_power_iteration_finds_dominant_axis(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        top_principal_direction,
    )

    # Variance concentrated on axis 2 (magnitudes 1..10) with a weak
    # axis-0 component: the dominant Gram eigenvector is e2, so the
    # max-normalized fixed point puts +-1e6 on dim 2 and ~0 elsewhere.
    rows = [
        (i, [0.01 * (i % 3), 0.0, float(i % 10 + 1), 0.0])
        for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["dim"]: r["v_fp"]
        for r in top_principal_direction(emb, iters=4, dim=4).collect()
    }
    assert abs(out[2]) == 1_000_000
    assert all(abs(out[d]) < 20_000 for d in (1, 3))
    assert abs(out[0]) < 100_000


def test_power_iteration_matches_numpy_dominant_eigvec(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    # anisotropic cloud: dominant direction is a random unit vector u
    u = rng.normal(size=6)
    u /= np.linalg.norm(u)
    pts = (
        np.outer(rng.normal(scale=5.0, size=80), u)
        + rng.normal(scale=0.3, size=(80, 6))
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        top_principal_direction,
    )

    out = top_principal_direction(emb, iters=6, dim=6).collect()
    v = np.array([r["v_fp"] for r in sorted(out, key=lambda r: r["dim"])],
                 dtype=float)
    v /= np.linalg.norm(v)
    # numpy reference: dominant eigenvector of the quantized Gram matrix
    q = np.floor(pts * 1e6)
    g = q.T @ q
    w_, vec = np.linalg.eigh(g)
    ref = vec[:, -1]
    cos = abs(float(v @ ref))
    assert cos > 0.999, cos


def test_pq_encode_codebook_vectors_are_lossless(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        pq_encode,
    )

    # 4 codebook vectors over 8 dims, 2 subspaces of 4; corpus = the
    # codebook itself plus one vector whose halves come from DIFFERENT
    # codebook entries.
    def vec(seed):
        return [float((seed * 7 + i) % 5) for i in range(8)]

    cb_rows = [(c, vec(c)) for c in range(4)]
    cb = spark.createDataFrame(cb_rows, "code_id long, embedding array<float>")
    corpus_rows = [(i, v) for i, v in cb_rows]
    corpus_rows.append((100, vec(1)[:4] + vec(3)[4:]))
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<float>"
    )
    out = {
        r["vec_id"]: (r["codes"], r["err_micros2"])
        for r in pq_encode(corpus, cb, n_subspaces=2, dim=8).collect()
    }
    assert len(out) == 5
    # every codebook vector encodes to itself with zero error
    for c in range(4):
        codes, err = out[c]
        assert codes == f"{c},{c}" and err == 0
    # the spliced vector picks each half's source code, still zero error
    assert out[100] == ("1,3", 0)


def test_pq_encode_error_is_reported(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        pq_encode,
    )

    cb = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0] * 8)], "code_id long, embedding array<float>"
    )
    corpus = spark.createDataFrame(
        [(7, [0.25] * 8)], "vec_id long, embedding array<float>"
    )
    [row] = pq_encode(corpus, cb, n_subspaces=2, dim=8).collect()
    # nearest is the all-zero code; err = 8 * (250000)^2
    assert row["codes"] == "0,0"
    assert row["err_micros2"] == 8 * 250_000 ** 2


def test_pq_search_adc_exact_on_codebook_corpus(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        pq_encode,
        pq_search,
    )

    # Corpus == codebook → every vector encodes losslessly, so ADC
    # distance equals the exact quantized L2 distance and the top-1
    # neighbor of each query (a corpus member) is itself at distance 0.
    def vec(seed):
        return [float((seed * 7 + i) % 5) for i in range(8)]

    cb_rows = [(c, vec(c)) for c in range(4)]
    cb = spark.createDataFrame(cb_rows, "code_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        [(i, v) for i, v in cb_rows], "vec_id long, embedding array<float>"
    )
    codes = pq_encode(corpus, cb, n_subspaces=2, dim=8)
    out = pq_search(codes, cb, corpus, n_subspaces=2, dim=8, k=4).collect()
    assert len(out) == 16  # 4 queries x k=4
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert rows[0]["neighbor_id"] == qid
        assert rows[0]["adist_micros2"] == 0
        # exact quantized L2 reference for the rest
        q = [math.floor(x * 1e6) for x in vec(qid)]
        for r in rows:
            c = [math.floor(x * 1e6) for x in vec(r["neighbor_id"])]
            exact = sum((a - b) ** 2 for a, b in zip(q, c))
            assert r["adist_micros2"] == exact


def test_pq_search_reads_codes_not_vectors(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        pq_search,
    )

    # The corpus side carries ONLY (id, codes) — no vector column —
    # proving the scan never needs the original embeddings.
    cb = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0] * 8)], "code_id long, embedding array<float>"
    )
    codes = spark.createDataFrame(
        [(7, "0,1"), (8, "1,1")], "vec_id long, codes string"
    )
    queries = spark.createDataFrame(
        [(42, [1.0] * 8)], "vec_id long, embedding array<float>"
    )
    out = {
        r["neighbor_id"]: r["adist_micros2"]
        for r in pq_search(codes, cb, queries, n_subspaces=2, dim=8).collect()
    }
    # d(query_sub=[1e6]*4, code0=[0]*4) = 4e12 per subspace
    assert out == {7: 4 * 10 ** 12, 8: 0}


def test_ivf_pq_search_probes_restrict_and_adc_exact(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        ivf_pq_search,
    )

    # Two well-separated cells: centroids are ids 0 and 2 (stride 2).
    # Codebook == corpus, so PQ codes are lossless and ADC == exact
    # quantized L2.  A query at [2]*8 with nprobe=1 probes cell 0 only:
    # ids 2 and 3 must be absent even though they have finite ADC.
    rows = [
        (0, [0.0] * 8),
        (1, [1.0] * 8),
        (2, [100.0] * 8),
        (3, [99.0] * 8),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = spark.createDataFrame(
        [(i, v) for i, v in rows], "code_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(42, [2.0] * 8)], "vec_id long, embedding array<float>"
    )
    out = ivf_pq_search(
        corpus, queries, cb, centroid_stride=2, nprobe=1,
        n_subspaces=2, dim=8, k=4,
    ).collect()
    got = [(r["neighbor_id"], r["adist_micros2"], r["rank"]) for r in
           sorted(out, key=lambda r: r["rank"])]
    # only cell-0 members; exact integer micros^2 distances
    assert got == [
        (1, 8 * (1_000_000) ** 2, 1),
        (0, 8 * (2_000_000) ** 2, 2),
    ]


def test_margin_mine_hub_suppression(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        margin_mine,
    )

    # right side: b1 is a perfect partner for a0 only; b_hub is
    # moderately close to EVERYTHING (a classic hub) — raw cosine
    # would pair a2 with b_hub confidently, the margin must not
    left = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (4, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    right = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),       # exact partner of 0
            (3, [0.5, 0.5, 0.5, 0.5]),       # hub: cos 0.5 to every axis
            (5, [0.6, 0.51, 0.5, 0.5]),      # second hub, slightly tilted
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["src_id"]: r
        for r in margin_mine(left, right, k=2).collect()
    }
    # a0 finds its exact partner with a margin clearly above the hubs'
    assert got[0]["dst_id"] == 1
    assert got[0]["cos_e6"] == 1000000
    assert got[0]["margin_permille"] > got[2]["margin_permille"]
    assert got[0]["margin_permille"] > got[4]["margin_permille"]
    assert got[0]["accepted"]
    # hub-paired rows exist but margins hover near 1000 (no standout)
    assert got[2]["margin_permille"] < 1300


def test_margin_mine_blocked_degenerates_to_exact_brute(spark):
    """Below target_bucket the adaptive plane count is 0 and the
    blocked miner must be BIT-EXACT to margin_mine — this equality is
    what makes the brute-force oracle a strict gate for the blocked
    query at sf0.01."""
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        margin_mine,
        margin_mine_blocked,
    )

    import random

    rng = random.Random(13)
    mk = lambda: [rng.uniform(-1, 1) for _ in range(8)]
    left = spark.createDataFrame(
        [(i, mk()) for i in range(0, 40, 2)],
        "vec_id long, embedding array<float>",
    )
    right = spark.createDataFrame(
        [(i, mk()) for i in range(1, 40, 2)],
        "vec_id long, embedding array<float>",
    )
    brute = sorted(
        tuple(r) for r in margin_mine(left, right, k=3).collect()
    )
    blocked = sorted(
        tuple(r)
        for r in margin_mine_blocked(
            left, right, k=3, target_bucket=512, dim=8
        ).collect()
    )
    assert blocked == brute


def test_margin_mine_blocked_lsh_path_finds_exact_partners(spark):
    """Past target_bucket the LSH tables engage; identical vectors
    hash to the same bucket in EVERY table, so an exact partner is
    always a candidate and surfaces as the best pair."""
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        margin_mine_blocked,
    )

    import random

    rng = random.Random(29)
    mk = lambda: [rng.uniform(-1, 1) for _ in range(8)]
    rights = [(2 * i + 1, mk()) for i in range(64)]
    right = spark.createDataFrame(
        rights, "vec_id long, embedding array<float>"
    )
    # each left vector IS one right vector (ids 1, 21, 41, 61)
    left = spark.createDataFrame(
        [(rid - 1, v) for rid, v in rights[::10][:4]],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["src_id"]: r
        for r in margin_mine_blocked(
            left, right, k=2, target_bucket=8, dim=8
        ).collect()
    }
    assert len(out) == 4
    for rid, _ in rights[::10][:4]:
        assert out[rid - 1]["dst_id"] == rid
        assert out[rid - 1]["cos_e6"] == 1_000_000


def test_kcenter_coreset_farthest_point_rounds(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        kcenter_coreset,
    )

    # three well-separated clusters on axes; one outlier far away —
    # greedy k-center must pick the outlier before densifying clusters
    rows = [
        (0, [0.0, 0.0]), (1, [0.1, 0.0]),          # cluster A
        (10, [10.0, 0.0]), (11, [10.1, 0.0]),      # cluster B
        (20, [0.0, 50.0]),                          # outlier
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kcenter_coreset(df, k=3).orderBy("round").collect()
    assert [r["round"] for r in got] == [0, 1, 2]
    assert got[0]["vec_id"] == 0 and got[0]["radius_sq"] == 0
    # farthest from id 0 is the outlier (50^2 in micros^2)
    assert got[1]["vec_id"] == 20
    assert got[1]["radius_sq"] == (50_000_000) ** 2
    # then cluster B — id 11 (at 10.1) is strictly farther from
    # center 0 than id 10, so greedy argmax picks it
    assert got[2]["vec_id"] == 11
    assert got[2]["radius_sq"] == (10_100_000) ** 2 + 0


def test_facility_location_mass_coverage_and_monotone(spark):
    """Facility location picks MASS coverage: with many points piled on
    one axis and a lone point on another, the first selected center
    lies in the crowd; the objective is nondecreasing across rounds
    and every selected id is distinct."""
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        facility_location,
    )

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(30)]
    rows.append((100, [0.0, 1.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sorted(
        facility_location(df, k=3, n_candidates=8).collect(),
        key=lambda r: r["round"],
    )
    assert len(out) == 3
    assert out[0]["vec_id"] != 100  # first pick covers the crowd
    objs = [r["objective"] for r in out]
    assert objs == sorted(objs)
    assert len({r["vec_id"] for r in out}) == 3


def test_maxsim_prefers_partial_topical_match(spark):
    """MaxSim's defining behavior: a doc matching EVERY query token
    moderately beats a doc matching one token perfectly and the rest
    not at all — and self-retrieval is exact (score = n_tokens * 1e6)."""
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        maxsim_retrieval,
    )

    q = [(0, 0, [1.0, 0.0, 0.0, 0.0]), (0, 1, [0.0, 1.0, 0.0, 0.0])]
    corpus = q + [
        # doc 1: moderate match to BOTH query tokens (cos ~0.707 each)
        (1, 0, [0.7071, 0.7071, 0.0, 0.0]),
        (1, 1, [0.7071, 0.7071, 0.0, 0.0]),
        # doc 2: perfect match to token 0 only
        (2, 0, [1.0, 0.0, 0.0, 0.0]),
        (2, 1, [0.0, 0.0, 1.0, 0.0]),
    ]
    cdf = spark.createDataFrame(
        corpus, "doc_id long, tok_id long, embedding array<float>"
    )
    qdf = cdf.filter("doc_id = 0")
    out = {r["doc_id"]: r for r in maxsim_retrieval(cdf, qdf, k=3).collect()}
    assert out[0]["maxsim_e6"] == 2_000_000  # self: every token exact
    assert out[0]["rank"] == 1
    # both-token moderate (~1.414e6) beats one-token perfect (1e6)
    assert out[1]["maxsim_e6"] > out[2]["maxsim_e6"]
    assert out[2]["maxsim_e6"] == 1_000_000


def test_centroid_novelty_orthogonal_outlier(spark):
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        centroid_novelty,
    )

    # group 1: two vectors on +x, one orthogonal outlier on +y
    rows = [
        (1, 1, [1.0, 0.0]),
        (2, 1, [2.0, 0.0]),
        (3, 1, [0.0, 1.0]),
        # group 2: a single vector is its own centroid -> cos = 1
        (9, 2, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {r["id"]: r["cos_centroid_e6"]
           for r in centroid_novelty(df).collect()}
    # centroid-sum of g1 = (3s, 1s): on-axis vectors score high,
    # the orthogonal outlier scores lowest
    assert out[3] < out[1] and out[3] < out[2]
    import math
    # cos(x-axis vec, (3,1)) = 3/sqrt(10)
    exp = math.floor(1e6 * 3 / math.sqrt(10))
    assert abs(out[1] - exp) <= 1   # quantization at 2^20 is exact here
    assert out[9] == 999999 or out[9] == 1000000  # cos(v, v) = 1


def test_empty_corpus_contracts(spark, tmp_path):
    """Round-14 zero-row audit: a partition-pruned slice is routinely
    empty on a real cluster — driver-side seed collects must not
    crash, selections must emit no rows, and a persisted EMPTY IVF
    index must still round-trip (the partitioned lists write leaves
    no data files, so the probe depends on the _schema sidecar)."""
    from blueforty___etl_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        kcenter_coreset,
        probe_ivf_index,
        top_principal_direction,
    )

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    assert kcenter_coreset(empty, k=3).count() == 0
    assert top_principal_direction(empty, iters=2).count() == 0

    path = str(tmp_path / "ivf_empty")
    build_ivf_index(empty, path, centroid_stride=50)
    q = spark.createDataFrame(
        [(1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    assert probe_ivf_index(spark, path, q, k=3, nprobe=2).count() == 0
