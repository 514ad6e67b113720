"""Dedup + text-analysis operators (north-star extensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.functions.text import (
    doc_fingerprint,
    md5_hash64,
    ngrams,
    token_count_bpeish,
    token_count_ws,
    tokens_ws,
)
from blueforty___etl_data_pipeline_spark.operators.dedup import (
    dedup_exact,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from blueforty___etl_data_pipeline_spark.operators.text_ops import (
    language_id,
    text_quality,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_dup_groups_counts_and_canonical(spark):
    df = _docs(spark, ["aa", "bb", "aa", "aa", "cc"])
    out = {r["canonical_id"]: r["dup_count"] for r in exact_dup_groups(df).collect()}
    assert out == {0: 3, 1: 1, 4: 1}


def test_dedup_exact_keeps_lowest_id(spark):
    df = _docs(spark, ["aa", "bb", "aa"])
    kept = sorted(r["doc_id"] for r in dedup_exact(df).collect())
    assert kept == [0, 1]


def test_minhash_identical_docs_equal_signatures(spark):
    df = _docs(spark, ["the quick brown fox jumps over a lazy dog"] * 2)
    sigs = [r["minhash_sig"] for r in minhash_signatures(df, num_hashes=16).collect()]
    assert sigs[0] == sigs[1] and len(sigs[0]) == 16


def test_minhash_empty_doc_null_signature(spark):
    df = _docs(spark, ["", "one two three four"])
    rows = {r["doc_id"]: r["minhash_sig"] for r in minhash_signatures(df).collect()}
    assert rows[0] is None and rows[1] is not None


def test_lsh_finds_near_duplicates(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base + "one extra token"
    df = _docs(spark, [base, near, "totally different content entirely here now"])
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(df).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_lsh_bucket_cap_drops_degenerate_bucket(spark):
    df = _docs(spark, ["same same same same text here"] * 10)
    capped = minhash_lsh_pairs(df, max_bucket_size=5)
    assert capped.count() == 0  # every band bucket has 10 members > cap


def test_jaccard_exact_values(spark):
    # 'a b c d' shingles(3): {abc, bcd}; 'a b c e': {abc, bce} → J = 1/3.
    df = _docs(spark, ["a b c d", "a b c e"])
    rows = ngram_jaccard_pairs(df, threshold=0.0).collect()
    assert len(rows) == 1
    assert abs(rows[0]["jaccard"] - 1 / 3) < 1e-12


def test_simhash_near_dups_close_in_hamming(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    df = _docs(spark, [base, base + "extra", "unrelated words apart totally"])
    out = df.select("doc_id", simhash64(F.col("text")).alias("h")).collect()
    h = {r["doc_id"]: r["h"] for r in out}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[0], h[1]) < ham(h[0], h[2])


def test_simhash_empty_is_zero(spark):
    df = _docs(spark, [""])
    assert df.select(simhash64(F.col("text")).alias("h")).collect()[0]["h"] == 0


def test_tokens_and_ngrams_edges(spark):
    df = spark.createDataFrame([("  a  b c  ",), ("",), ("one two",)], "t string")
    out = df.select(
        token_count_ws(F.col("t")).alias("n"),
        F.size(ngrams(tokens_ws(F.col("t")), 3)).alias("g3"),
    ).collect()
    assert [(r["n"], r["g3"]) for r in out] == [(3, 1), (0, 0), (2, 0)]


def test_bpeish_token_count(spark):
    df = spark.createDataFrame([("Hello, world42!",)], "t string")
    # tokens: Hello , world 42 ! → 5
    assert df.select(token_count_bpeish(F.col("t")).alias("n")).collect()[0]["n"] == 5


def test_text_quality_known_values(spark):
    df = _docs(spark, ["the cat, and hat"])
    r = text_quality(df).collect()[0]
    assert r["n_chars"] == 16 and r["n_tokens"] == 4
    assert abs(r["punct_ratio"] - 1 / 16) < 1e-12
    assert abs(r["stopword_ratio"] - 0.5) < 1e-12  # 'the', 'and'


def test_language_id_argmax_and_unknown(spark):
    df = _docs(
        spark,
        [
            "the cat and the dog of the house",
            "el gato y la casa de la abuela",
            "zzz qqq xxx",
        ],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert out == {0: "en", 1: "es", 2: "und"}


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [("a b c d e",), ("e d c b a",)], "text string"
    )
    out = df.select(doc_fingerprint(F.col("text")).alias("f")).collect()
    assert out[0]["f"] != out[1]["f"]


def test_md5_hash64_stable(spark):
    # Portable hash: pinned value so any engine change is caught.
    v = spark.range(1).select(md5_hash64(F.lit("abc")).alias("h")).collect()[0]["h"]
    assert v == 648541476951500027  # == int(md5('abc').hexdigest()[:15], 16)


def test_simhash_pairs_blocking_and_precision(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    df = _docs(spark, [base, base, "completely unrelated other words"])
    rows = simhash_near_dup_pairs(df, max_hamming=3, bands=4).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert pairs.get((0, 1)) == 0  # identical docs: distance 0, found
    assert (0, 2) not in pairs and (1, 2) not in pairs  # exact filter


def test_quality_filter_gates(spark):
    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        quality_filter,
    )

    prose = "the quick brown fox and the lazy dog of the farm " * 3
    df = _docs(spark, [prose, "!!! ??? *** $$$ %%% ### @@@ &&& ^^^ ~~~ ...", "too short"])
    kept = [r["doc_id"] for r in quality_filter(df, min_tokens=10).collect()]
    assert kept == [0]  # punctuation soup and short doc both dropped


def test_assign_packs_boundaries(spark):
    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        assign_packs,
    )

    df = _docs(spark, ["a b c d", "e f g h", "i j k l", "m n o p"])
    rows = {r["doc_id"]: r["pack_id"] for r in assign_packs(df, budget=10).collect()}
    # cumulative-before: 0, 4, 8, 12 → packs 0, 0, 0, 1
    assert rows == {0: 0, 1: 0, 2: 0, 3: 1}


def test_minhash_arrow_parity_with_expr(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        minhash_signatures_arrow,
    )

    df = _docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog again and again",
            "short",  # < 3 tokens → null signature in both impls
            "",
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        ],
    )
    a = {r["doc_id"]: r["minhash_sig"] for r in minhash_signatures(df, num_hashes=16).collect()}
    b = {r["doc_id"]: r["minhash_sig"] for r in minhash_signatures_arrow(df, num_hashes=16).collect()}
    assert a == b  # bit-identical, including the null cases


def test_normalize_text(spark):
    from blueforty___etl_data_pipeline_spark.functions.text import (
        normalize_text,
    )

    df = spark.createDataFrame([("  Hello,  WORLD!! 42  ",)], "t string")
    out = df.select(
        normalize_text(F.col("t"), strip_punct=True).alias("n")
    ).collect()[0]["n"]
    assert out == "hello world 42"


def test_simhash_arrow_parity_with_expr(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        simhash_arrow,
    )

    df = _docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog",
            "",
            "alpha beta gamma delta epsilon",
        ],
    )
    a = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", simhash64(F.col("text")).alias("h")).collect()
    }
    b = {r["doc_id"]: r["simhash"] for r in simhash_arrow(df).collect()}
    assert a == b


def test_assign_packs_scalable_equals_global(spark, sf_small):
    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        assign_packs,
        assign_packs_scalable,
    )
    from blueforty___etl_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    a = assign_packs(docs, budget=512)
    b = assign_packs_scalable(docs, budget=512, chunk_size=100)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_scrub_pii_redacts_and_counts(spark):
    from blueforty___etl_data_pipeline_spark.operators.text_ops import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org now"),
            (2, "call 555-867-5309 or 555.867.5309"),
            (3, "host 192.168.0.1 ssn 123-45-6789"),
            (4, "clean text, nothing to hide"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["redacted"], r["pii_count"]) for r in scrub_pii(df).collect()}
    assert got[1] == ("mail <EMAIL> now", 1)
    assert got[2] == ("call <PHONE> or <PHONE>", 2)
    assert got[3] == ("host <IP> ssn <SSN>", 2)
    assert got[4] == ("clean text, nothing to hide", 0)


def test_scrub_pii_word_boundaries(spark):
    from blueforty___etl_data_pipeline_spark.operators.text_ops import scrub_pii

    # Digits embedded in longer tokens must NOT be scrubbed: version
    # strings are not IPs, long ids are not phones.
    df = spark.createDataFrame(
        [(1, "v1.2.3.4567 is a version not an ip")],
        "doc_id long, text string",
    )
    row = scrub_pii(df).collect()[0]
    assert row["redacted"] == "v1.2.3.4567 is a version not an ip"
    assert row["pii_count"] == 0


# ---------------------------------------------------------------------------
# fuzzy_key_pairs (SymSpell deletion-neighborhood blocking)
# ---------------------------------------------------------------------------


def test_fuzzy_key_pairs_complete_vs_brute_force(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import fuzzy_key_pairs

    keys = [
        (1, "spark"),
        (2, "spork"),    # substitution of 1
        (3, "sparks"),   # insertion on 1
        (4, "spak"),     # deletion from 1
        (5, "flink"),    # unrelated
        (6, "blink"),    # substitution of 5
        (7, "spark"),    # exact duplicate of 1
    ]
    df = spark.createDataFrame(keys, ["id", "key"])
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_key_pairs(df, key_col="key", id_col="id").collect()
    }

    def lev(a, b):
        import itertools
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[len(b)]

    want = {
        (a[0], b[0])
        for i, a in enumerate(keys)
        for b in keys[i + 1:]
        if lev(a[1], b[1]) <= 1
    }
    assert got == want
    assert (1, 7) in got and (5, 6) in got
    # "spark"→"spook" is distance 2: blocking may or may not surface it,
    # but the verify step must have dropped anything beyond distance 1
    assert all(p in want for p in got)


def test_fuzzy_key_pairs_no_cross_join_in_plan(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import fuzzy_key_pairs

    df = spark.createDataFrame([(1, "abc"), (2, "abd")], ["id", "key"])
    plan = fuzzy_key_pairs(df, key_col="key", id_col="id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_prefix_join_exact_pairs(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        jaccard_prefix_join,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "d c b a"),      # same token SET as doc 1 → jaccard 1
            (3, "a b c e"),      # 3/5 = 0.6 vs docs 1-2
            (4, "x y z w"),      # disjoint
        ],
        ["doc_id", "text"],
    )
    # t = 3/4: only the identical-set pair qualifies
    out = jaccard_prefix_join(docs, t_num=3, t_den=4).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]
    assert out[0]["jaccard_permille"] == 1000

    # t = 11/20 = 0.55: the 0.6 pairs must now appear — completeness of
    # the prefix filter at a threshold the 3/5 pairs straddle.
    out2 = {
        (r["id_a"], r["id_b"]): r["jaccard_permille"]
        for r in jaccard_prefix_join(docs, t_num=11, t_den=20).collect()
    }
    assert set(out2) == {(1, 2), (1, 3), (2, 3)}
    assert out2[(1, 3)] == 600


def test_duplicate_spans_flags_shared_boilerplate(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        duplicate_spans,
        span_dup_stats,
    )

    boiler = "t0 t1 t2 t3"  # the shared 4-token block
    docs = spark.createDataFrame(
        [
            (1, boiler + " u1 u2 u3 u4"),
            (2, boiler + " v1 v2 v3 v4"),  # shares only the leading span
            (3, "w1 w2 w3 w4 w5 w6 w7 w8"),  # no shared spans
            (4, "short doc"),  # < window tokens → no spans at all
        ],
        ["doc_id", "text"],
    )
    out = duplicate_spans(docs, window=4, stride=4).collect()
    # exactly the leading span of docs 1 and 2, nothing else
    assert sorted((r["doc_id"], r["span_idx"]) for r in out) == [(1, 0), (2, 0)]
    assert all(r["n_docs"] == 2 for r in out)

    stats = {
        r["doc_id"]: r for r in span_dup_stats(docs, window=4, stride=4).collect()
    }
    assert 4 not in stats  # too short to carry signal
    assert stats[1]["n_spans"] == 2 and stats[1]["n_dup_spans"] == 1
    assert stats[1]["dup_permille"] == 500
    assert stats[3]["n_dup_spans"] == 0 and stats[3]["dup_permille"] == 0


def test_duplicate_spans_stride_and_within_doc_repeat(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        duplicate_spans,
    )

    # The same 2-token span repeats WITHIN doc 1 only: min_docs counts
    # DISTINCT docs, so a within-doc repeat alone must not flag.
    docs = spark.createDataFrame(
        [(1, "p q p q"), (2, "r s r s")], ["doc_id", "text"]
    )
    assert duplicate_spans(docs, window=2, stride=2).count() == 0
    # stride=1 slides over every offset: doc 1 spans are (p q), (q p),
    # (p q) — still single-doc; across docs nothing matches.
    assert duplicate_spans(docs, window=2, stride=1).count() == 0
    # shared across docs → flagged at every position it occurs
    docs2 = spark.createDataFrame(
        [(1, "p q x"), (2, "y p q")], ["doc_id", "text"]
    )
    out = duplicate_spans(docs2, window=2, stride=1).collect()
    assert sorted((r["doc_id"], r["span_idx"]) for r in out) == [(1, 0), (2, 1)]


def test_lsh_dedup_incremental_drops_corpus_collisions(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        lsh_dedup_incremental,
    )

    body = " ".join(f"w{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(1, body), (2, "totally different corpus text " * 5)],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (100, body),                                   # exact dup of corpus 1
            (101, body + " tail"),                         # near-dup
            (102, " ".join(f"z{i}" for i in range(40))),   # novel
            (103, "a b"),                                  # < 3 tokens: no sig → kept
        ],
        ["doc_id", "text"],
    )
    out = lsh_dedup_incremental(new, corpus, num_hashes=32, bands=8)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert 100 not in kept          # exact dup must collide on every band
    assert 102 in kept and 103 in kept
    # near-dup 101 shares most shingles — with 8 bands of 4 rows a
    # collision is overwhelmingly likely but not guaranteed by
    # construction, so assert only that the survivor set is a subset
    assert set(kept) <= {101, 102, 103}
    # impl parity: the JVM-fold fallback keeps the identical survivor set
    expr_kept = sorted(
        r["doc_id"]
        for r in lsh_dedup_incremental(
            new, corpus, num_hashes=32, bands=8, impl="expr"
        ).collect()
    )
    assert expr_kept == kept


def test_ngram_model_score_deterministic_and_bounded(spark):
    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        ngram_model_score,
    )

    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "ab"), (3, ""), (4, "abcdef")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_model_score(df).collect()}
    # n_ngrams = max(len-2, 0)
    assert out[1]["n_ngrams"] == 4
    assert out[2]["n_ngrams"] == 0 and out[2]["score"] == 0
    assert out[3]["n_ngrams"] == 0 and out[3]["score"] == 0
    # identical text → identical score (pure function of content)
    assert out[1]["score"] == out[4]["score"]
    # per-trigram weights live in [-1000, 1000]
    assert abs(out[1]["score"]) <= 4 * 1000
    # stable under repartition (map-only, no state)
    again = {
        r["doc_id"]: r["score"]
        for r in ngram_model_score(df.repartition(5)).collect()
    }
    assert again == {k: v["score"] for k, v in out.items()}


def test_remove_duplicate_spans_rewrites_covered_tokens(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    # d1/d2 share the 4-token boilerplate prefix "a b c d" (span idx 0);
    # their tails are unique.  d3 is shorter than the window -> no spans,
    # passes through untouched.
    df = spark.createDataFrame(
        [
            (1, "a b c d x y z"),
            (2, "a b c d p q r"),
            (3, "s t"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(df, window=4, stride=2).collect()
    }
    assert out == {
        1: ("x y z", 7, 4),
        2: ("p q r", 7, 4),
        3: ("s t", 2, 0),
    }


def test_token_entropy_extremes(spark):
    import math

    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        token_entropy,
    )

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # degenerate: entropy 0
            (2, "a b c d"),          # uniform over 4: ln(4) nats
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["entropy_e6"])
        for r in token_entropy(df).collect()
    }
    assert out[1] == (4, 0)
    # uniform: contrib per token = floor(1e6*1*ln(4)); 4 of them div 4
    expect = math.floor(1_000_000 * math.log(4))
    assert out[2] == (4, expect)


def test_bucketed_packs_power_of_two_and_local_ids(spark):
    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        bucketed_packs,
    )

    # 3 tokens -> bucket 4; 4 -> 4; 5 -> 8; 1 -> 1.
    df = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b c d"),
            (3, "a b c d e"),
            (4, "a"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["bucket"], r["pack_id"])
        for r in bucketed_packs(df, budget=5).collect()
    }
    # bucket-4 docs pack together: doc1 cum-before 0 -> pack 0;
    # doc2 cum-before 3 -> pack 0 (3 < 5)
    assert out == {
        1: (3, 4, 0),
        2: (4, 4, 0),
        3: (5, 8, 0),
        4: (1, 1, 0),
    }


def test_containment_pairs_detects_excerpt(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        containment_pairs,
    )

    book = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    excerpt = "gamma delta epsilon zeta eta theta iota"  # 7 tokens -> 5 shingles
    other = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, book), (2, excerpt), (3, other)], "doc_id long, text string"
    )
    out = {
        (r["contained_id"], r["container_id"]): r["containment_permille"]
        for r in containment_pairs(df, threshold_permille=800).collect()
    }
    # the excerpt's 5 trigram shingles all appear in the book -> 1000
    # permille one way; the book (8 shingles) is NOT contained in the
    # excerpt (5/8 = 625 < 800); "other" shares nothing
    assert out == {(2, 1): 1000}


def test_dup_weights_null_text_forms_own_cluster(spark):
    # NULL-text rows hash a sentinel instead of dropping out of the
    # null-unsafe content_hash equi-join: every input row appears in
    # the output, and the NULLs cluster together.
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        dup_weights,
    )

    rows = [
        (1, "same"), (2, "same"), (3, "unique"), (4, None), (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["dup_count"], r["weight_permille"])
        for r in dup_weights(df).collect()
    }
    assert out == {
        1: (2, 500), 2: (2, 500), 3: (1, 1000), 4: (2, 500), 5: (2, 500),
    }


def test_candidate_cap_drops_hot_shingles_and_reports(spark):
    # Degenerate fixture: every doc shares one boilerplate sentence
    # (its trigram shingles are in ALL docs -> O(n^2) join pairs);
    # each doc also has unique content. The cap must kill the hot
    # shingles, report how many were dropped, and only ever LOWER
    # jaccard/containment (never overestimate).
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    boiler = "all rights reserved by the provider"
    rows = [(i, f"{boiler} unique{i} alpha{i} beta{i} gamma{i}") for i in range(20)]
    # plus one real near-dup pair sharing unique content
    rows += [
        (100, "the quick brown fox jumps over the lazy dog today"),
        (101, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = ngram_jaccard_pairs(df, threshold=0.5)
    assert "n_shingles_dropped" not in uncapped.columns  # schema stable
    un_pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in uncapped.collect()}

    capped = ngram_jaccard_pairs(
        df, threshold=0.5, max_candidates_per_shingle=5
    )
    rows_c = capped.collect()
    assert rows_c and all(r["n_shingles_dropped"] > 0 for r in rows_c)
    cap_pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows_c}
    # the boilerplate-only pairs lose their shared shingles entirely;
    # the genuine near-dup pair survives (its overlap is unique text)
    assert (100, 101) in cap_pairs
    for k, j in cap_pairs.items():
        assert j <= un_pairs.get(k, 0.0) + 1e-12  # lower bound

    capped_cont = containment_pairs(
        df, threshold_permille=500, min_shingles=3,
        max_candidates_per_shingle=5,
    )
    rc = capped_cont.collect()
    assert all(r["n_shingles_dropped"] > 0 for r in rc)
    uncapped_cont = containment_pairs(
        df, threshold_permille=500, min_shingles=3
    )
    assert "n_shingles_dropped" not in uncapped_cont.columns
    # capped containment pair volume can only shrink
    assert len(rc) <= uncapped_cont.count()


def test_augment_word_dropout_deterministic_and_salted(spark):
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        augment_word_dropout,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "")],
        "doc_id long, text string",
    )
    a1 = augment_word_dropout(df, rate_permille=300, salt="s1").collect()
    a2 = augment_word_dropout(df, rate_permille=300, salt="s1").collect()
    # bit-identical across runs
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))
    by_id = {r["doc_id"]: r for r in a1}
    r = by_id[1]
    assert r["n_tokens"] == 9
    assert r["n_dropped"] == 9 - len(r["aug_text"].split())
    # kept tokens preserve original order (a subsequence)
    orig = "the quick brown fox jumps over the lazy dog".split()
    it = iter(orig)
    assert all(tok in it for tok in r["aug_text"].split())
    # empty doc: no tokens, nothing dropped
    assert (by_id[2]["aug_text"], by_id[2]["n_tokens"],
            by_id[2]["n_dropped"]) == ("", 0, 0)
    # a second salt is its own deterministic variant
    b1 = augment_word_dropout(df, rate_permille=300, salt="s2").collect()
    b2 = augment_word_dropout(df, rate_permille=300, salt="s2").collect()
    assert sorted(map(tuple, b1)) == sorted(map(tuple, b2))
    # rate 0 keeps everything; rate 1000 drops everything
    keep_all = augment_word_dropout(df, rate_permille=0).collect()
    assert {r["doc_id"]: r["n_dropped"] for r in keep_all} == {1: 0, 2: 0}
    drop_all = augment_word_dropout(df, rate_permille=1000).collect()
    assert {r["doc_id"]: r["aug_text"] for r in drop_all} == {1: "", 2: ""}


def test_cross_source_dup_matrix_pairs_and_counts(spark):
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        cross_source_dup_matrix,
    )

    rows = [
        (1, "shared one", "a"),
        (2, "shared one", "b"),    # a-b share content "shared one"
        (3, "shared one", "b"),    # twice in b -> 1x2 doc pairs
        (4, "shared two", "a"),
        (5, "shared two", "c"),
        (6, "only a", "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_shared_contents"], r["n_shared_doc_pairs"]
        )
        for r in cross_source_dup_matrix(df).collect()
    }
    assert got == {("a", "b"): (1, 2), ("a", "c"): (1, 1)}


def test_cdc_chunks_shift_resistance(spark):
    """The CDC property: prepending tokens to a document changes only
    chunks in the edit's neighborhood — chunk hashes strictly after
    the first post-edit boundary are IDENTICAL, where fixed-size
    chunking would shift every one of them."""
    from blueforty___etl_data_pipeline_spark.operators.dedup import (
        cdc_chunks,
    )

    import random

    rng = random.Random(3)
    base = " ".join(f"w{rng.randrange(5000)}" for _ in range(400))
    edited = "inserted tokens at the front " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    out = cdc_chunks(df, mask_bits=4).collect()
    h1 = [r["chunk_hash"] for r in sorted(
        (r for r in out if r["doc_id"] == 1), key=lambda r: r["chunk_idx"])]
    h2 = [r["chunk_hash"] for r in sorted(
        (r for r in out if r["doc_id"] == 2), key=lambda r: r["chunk_idx"])]
    # every chunk of doc 1 except possibly its first (the edit
    # neighborhood) reappears verbatim in doc 2's chunk stream
    shared = set(h1[1:]) & set(h2)
    assert len(h1) > 5  # the fixture really chunked
    assert shared == set(h1[1:])
    # and those shared chunks carry n_copies == 2
    copies = {r["chunk_hash"]: r["n_copies"] for r in out}
    assert all(copies[h] == 2 for h in shared)
