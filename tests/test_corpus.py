"""Corpus-level operators: chunking, top n-grams, TF-IDF
(operators/corpus.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.operators.corpus import (
    chunk_documents,
    tfidf_top_terms,
    top_ngrams,
)


def test_chunk_windows_and_overlap(spark):
    # 10 tokens, window 4, overlap 1 → step 3 → chunks at 0,3,6 wide 4,
    # plus the tail chunk starting at 9? n_chunks = 1+ceil((10-4)/3)=3.
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, max_tokens=4, overlap=1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_text"] for r in rows] == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
    ]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4]


def test_chunk_short_doc_is_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")], "doc_id long, text string")
    rows = chunk_documents(df, max_tokens=16, overlap=4).collect()
    assert len(rows) == 1  # empty doc → no chunks
    assert rows[0]["chunk_text"] == "a b"


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=8, overlap=8)


def test_chunk_tail_never_empty(spark):
    # n = 12, window 8, overlap 4 → step 4 → n_chunks = 1+ceil(4/4) = 2:
    # [0:8], [4:12]. A naive formula would emit a third, empty chunk.
    text = " ".join(f"t{i}" for i in range(12))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, max_tokens=8, overlap=4).collect()
    assert len(rows) == 2
    assert all(r["n_chunk_tokens"] == 8 for r in rows)


def test_top_ngrams_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y")], "doc_id long, text string"
    )
    # bigrams: doc1: "a b","b a","a b","b c"; doc2: "a b","b x","x y"
    rows = top_ngrams(df, n=2, k=3).collect()
    assert (rows[0]["gram"], rows[0]["cnt"]) == ("a b", 3)
    # count-1 ties resolve alphabetically
    assert [r["gram"] for r in rows[1:]] == ["b a", "b c"]


def test_tfidf_prefers_rare_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "common rare1 common common"),
            (2, "common rare2"),
            (3, "common other"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["rk"]): r["term"]
        for r in tfidf_top_terms(df, k=2).collect()
    }
    # 'common' appears in every doc → idf = ln(1) = 0; rare terms win.
    assert out[(1, 1)] == "rare1"
    assert out[(2, 1)] == "rare2"
    # Exact fixed-point value: tf=1, idf=ln(3/1).
    got = {
        r["term"]: r["score_e6"]
        for r in tfidf_top_terms(df, k=2).filter(F.col("doc_id") == 2).collect()
    }
    assert got["rare2"] == math.floor(math.log(3.0) * 1e6)


# ---------------------------------------------------------------------------
# Decontamination (contamination_hits / decontaminate)
# ---------------------------------------------------------------------------


def _decon_frames(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        contamination_hits,
        decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with zero overlap here"),
            (3, "quick brown fox appears in this training doc"),
            (4, "short"),  # < 3 tokens → no shingles at all
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox is a benchmark sentence")],
        "doc_id long, text string",
    )
    return corpus, eval_df, contamination_hits, decontaminate


def test_contamination_hits_counts_shared_shingles(spark):
    corpus, eval_df, contamination_hits, _ = _decon_frames(spark)
    hits = {r["doc_id"]: r["n_hits"] for r in
            contamination_hits(corpus, eval_df).collect()}
    # doc 1 shares "the quick brown" and "quick brown fox"; doc 3 shares
    # "quick brown fox"; docs 2 and 4 share nothing (absent from output).
    assert hits == {1: 2, 3: 1}


def test_decontaminate_drops_only_hit_docs(spark):
    corpus, eval_df, _, decontaminate = _decon_frames(spark)
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, eval_df).collect()
    )
    assert kept == [2, 4]
    # min_hits=2 only drops the 2-shingle overlap doc.
    kept2 = sorted(
        r["doc_id"]
        for r in decontaminate(corpus, eval_df, min_hits=2).collect()
    )
    assert kept2 == [2, 3, 4]


def test_decontaminate_preserves_all_columns(spark):
    corpus, eval_df, _, decontaminate = _decon_frames(spark)
    assert decontaminate(corpus, eval_df).columns == corpus.columns


def test_decontamination_partition_property(spark):
    # Property: hits ∪ kept partitions the corpus exactly (min_hits=1),
    # and every kept doc truly shares no shingle with the eval set.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        contamination_hits,
        decontaminate,
    )

    words = st.sampled_from("alpha beta gamma delta epsilon zeta".split())
    texts = st.lists(
        st.lists(words, min_size=3, max_size=8).map(" ".join),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=8, deadline=None)
    @given(corpus_texts=texts, eval_texts=texts)
    def check(corpus_texts, eval_texts):
        corpus = spark.createDataFrame(
            list(enumerate(corpus_texts)), "doc_id long, text string"
        )
        eval_df = spark.createDataFrame(
            [(1000 + i, t) for i, t in enumerate(eval_texts)],
            "doc_id long, text string",
        )
        hit_ids = {
            r["doc_id"]
            for r in contamination_hits(corpus, eval_df).collect()
        }
        kept_ids = {
            r["doc_id"] for r in decontaminate(corpus, eval_df).collect()
        }
        all_ids = set(range(len(corpus_texts)))
        assert hit_ids | kept_ids == all_ids
        assert hit_ids & kept_ids == set()

        def trigrams(t):
            toks = t.split()
            return {
                tuple(toks[i:i + 3]) for i in range(len(toks) - 2)
            }

        eval_grams = set().union(*(trigrams(t) for t in eval_texts))
        for i, t in enumerate(corpus_texts):
            overlap = bool(trigrams(t) & eval_grams)
            assert (i in hit_ids) == overlap

    check()


# ---------------------------------------------------------------------------
# dedup_lines (CCNet-style line-level dedup)
# ---------------------------------------------------------------------------


def _line_dedup_fixture(spark):
    boiler = "accept cookies to continue"
    docs = [
        (1, f"{boiler}\nalpha prose one\nbravo prose two"),
        (2, f"{boiler}\ncharlie prose three"),
        (3, "delta prose four\nalpha prose one"),
        (4, boiler),
    ]
    return spark.createDataFrame(docs, ["doc_id", "text"])


def test_dedup_lines_removes_corpus_frequent_lines(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import dedup_lines

    out = {
        r["doc_id"]: r
        for r in dedup_lines(_line_dedup_fixture(spark), min_dup=2).collect()
    }
    # boilerplate (3 docs) and "alpha prose one" (2 docs) are removed
    assert out[1]["kept_text"] == "bravo prose two"
    assert (out[1]["n_kept"], out[1]["n_removed"]) == (1, 2)
    assert out[2]["kept_text"] == "charlie prose three"
    assert out[3]["kept_text"] == "delta prose four"
    # a doc that was ALL boilerplate survives as an empty shell
    assert out[4]["kept_text"] == ""
    assert (out[4]["n_kept"], out[4]["n_removed"]) == (0, 1)


def test_dedup_lines_preserves_line_order(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import dedup_lines

    docs = spark.createDataFrame(
        [(1, "z last\na first\nz last\nm middle")], ["doc_id", "text"]
    )
    # min_dup high enough that nothing is removed: reassembly must be
    # the identity, whatever partitioning collect_list saw
    row = dedup_lines(docs, min_dup=10).collect()[0]
    assert row["kept_text"] == "z last\na first\nz last\nm middle"
    assert row["n_removed"] == 0


def test_dedup_lines_within_doc_repeats_count(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import dedup_lines

    # the same line twice in ONE doc reaches min_dup=2 on its own
    docs = spark.createDataFrame(
        [(1, "dup line\nunique line\ndup line")], ["doc_id", "text"]
    )
    row = dedup_lines(docs, min_dup=2).collect()[0]
    assert row["kept_text"] == "unique line"
    assert row["n_removed"] == 2


def test_repetition_signals_counts_lines_and_chars(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        repetition_signals,
    )

    docs = spark.createDataFrame(
        [
            (1, "aa\nbb\naa\ncc\naa"),  # 'aa' ×3 → 2 dup occurrences
            (2, "xx\nyy"),  # no repetition
            (3, ""),  # empty doc → all zeros
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert (out[1]["n_lines"], out[1]["n_dup_lines"]) == (5, 2)
    assert (out[1]["line_chars"], out[1]["dup_line_chars"]) == (10, 4)
    assert (out[2]["n_lines"], out[2]["n_dup_lines"]) == (2, 0)
    assert out[2]["dup_line_chars"] == 0
    assert (out[3]["n_lines"], out[3]["line_chars"]) == (0, 0)


def test_repetition_signals_ignores_blank_lines(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        repetition_signals,
    )

    # consecutive \n produce empty strings — filtered before counting,
    # so blank lines never count as "duplicated"
    docs = spark.createDataFrame([(1, "aa\n\n\naa\n")], ["doc_id", "text"])
    row = repetition_signals(docs).collect()[0]
    assert (row["n_lines"], row["n_dup_lines"]) == (2, 1)
    assert (row["line_chars"], row["dup_line_chars"]) == (4, 2)


def test_build_vocab_rank_and_prune(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        build_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a b")], ["doc_id", "text"]
    )
    out = {
        r["token"]: r for r in build_vocab(docs, min_count=2).collect()
    }
    # c (count 1) pruned; b (4) ranks before a (3)
    assert set(out) == {"a", "b"}
    assert out["b"]["token_id"] == 1 and out["b"]["cnt"] == 4
    assert out["a"]["token_id"] == 2 and out["a"]["cnt"] == 3


def test_bm25_exact_scores_and_order(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import bm25_topk

    # Hand-checkable corpus: doc 1 has 'q' twice in 4 tokens, doc 2 has
    # 'q' once in 2 tokens, doc 3 never.  N=3, total_len=8.
    docs = spark.createDataFrame(
        [(1, "q q x y"), (2, "q z"), (3, "x y")], ["doc_id", "text"]
    )
    out = bm25_topk(docs, terms=["q"], k=10).collect()
    # Only matching docs appear; ordering by exact fixed-point score.
    assert [r["doc_id"] for r in out] == [1, 2]

    def score(tf, dl, n_docs=3, total_len=8, df_t=2, scale=1000):
        idf = ((2 * n_docs - 2 * df_t + 1) * scale) // (2 * df_t + 1)
        return (idf * (22 * tf * total_len)) // (
            (10 * tf + 3) * total_len + 9 * dl * n_docs
        )

    got = {r["doc_id"]: r["score_fp"] for r in out}
    assert got[1] == score(tf=2, dl=4)
    assert got[2] == score(tf=1, dl=2)


def test_bm25_rarer_term_outweighs_common(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import bm25_topk

    # 'rare' appears in 1 of 4 docs, 'common' in all 4.  Same tf and dl
    # for the probe docs, so the rare-term doc must score higher.
    docs = spark.createDataFrame(
        [
            (1, "rare a b"),
            (2, "common a b"),
            (3, "common c d"),
            (4, "common e f"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["score_fp"]
        for r in bm25_topk(docs, terms=["rare", "common"], k=10).collect()
    }
    assert out[1] > out[2] == out[3] == out[4]


def test_rare_token_stats_counts(spark):
    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        rare_token_stats,
    )

    docs = spark.createDataFrame(
        [(1, "in in out"), (2, "in in in in")], ["doc_id", "text"]
    )
    vocab = spark.createDataFrame([("in",)], ["token"])
    out = {r["doc_id"]: r for r in rare_token_stats(docs, vocab).collect()}
    assert (out[1]["n_tokens"], out[1]["n_oov"]) == (3, 1)
    assert out[1]["oov_permille"] == 333
    assert (out[2]["n_tokens"], out[2]["n_oov"]) == (4, 0)
    assert out[2]["oov_permille"] == 0


def test_strip_html_blocks_tags_entities(spark):
    from blueforty___etl_data_pipeline_spark.functions.text import strip_html

    html = (
        '<html><head><style>p {color: red}</style><!-- note --></head>'
        '<body><h1>Title</h1><p>A &amp; B &lt;kept&gt;</p>'
        '<script>if (1 < 2) { alert("x"); }</script>'
        '<p>tail   text</p></body></html>'
    )
    df = spark.createDataFrame([(html,)], ["html"])
    out = df.select(strip_html(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == "Title A & B <kept> tail text"


def test_strip_html_amp_decoded_last(spark):
    from blueforty___etl_data_pipeline_spark.functions.text import strip_html

    # '&amp;lt;' must become the literal '&lt;', never '<'.
    df = spark.createDataFrame([("<p>&amp;lt;</p>",)], ["html"])
    out = df.select(strip_html(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == "&lt;"


def test_tfidf_doc_similarity_picks_matching_doc(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        tfidf_doc_similarity,
    )

    # docs 1 and 2 share their distinctive terms; doc 3 is unrelated
    # but shares the common filler term with everyone.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta filler"),
            (2, "alpha beta filler"),
            (3, "gamma delta filler"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r for r in tfidf_doc_similarity(docs, k_terms=5).collect()
    }
    assert out[1]["similar_doc"] == 2
    assert out[2]["similar_doc"] == 1
    # identical sparse vectors → cos² = 1 exactly
    assert out[1]["cos2_permille"] == 1000
    # doc 3 still finds a neighbor through the shared filler term,
    # with strictly lower similarity
    assert out[3]["cos2_permille"] < 1000


def test_corpus_report_global_dup_attribution(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        corpus_report,
    )

    rows = [
        # boilerplate shared ACROSS sources: both must report it
        (1, "a", "en", "same text"),
        (2, "b", "en", "same text"),
        # in-source duplicate pair
        (3, "a", "en", "twin"),
        (4, "a", "fr", "twin"),
        # uniques
        (5, "a", "en", "unique one two"),
        (6, "b", "de", "other unique"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    out = {r["source"]: r for r in corpus_report(df).collect()}
    a, b = out["a"], out["b"]
    assert a["n_docs"] == 4 and b["n_docs"] == 2
    # source a: doc1 (cross-source dup) + docs 3,4 → 3 dup docs
    assert a["n_dup_docs"] == 3 and a["dup_permille"] == 750
    # source b: doc2 is a dup even though its twin lives in source a
    assert b["n_dup_docs"] == 1 and b["dup_permille"] == 500
    assert a["n_langs"] == 2 and b["n_langs"] == 2
    assert a["total_tokens"] == 2 + 1 + 1 + 3
    assert b["total_tokens"] == 2 + 2


def test_collocations_pmi_ranks_true_pair_first(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        collocations,
    )

    # "neural networks" co-occur in 4 docs and never apart; "the" is in
    # every doc, so (neural, networks) must out-PMI any pair with "the".
    docs = [
        (i, "the neural networks paper") for i in range(4)
    ] + [(10 + i, "the boring text here") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    import math

    rows = collocations(df, k=5, min_pair_count=2).collect()
    top = rows[0]
    # the two 3-token cliques tie at PMI ln2 (perfect association over
    # half the docs); every clique pair must out-rank anything with
    # "the" (PMI 0), and the top pair is never a "the" pair
    assert "the" not in (top["a"], top["b"])
    assert top["pmi_e6"] == math.floor(1_000_000 * math.log(2))
    assert all(r["c_pair"] >= 2 for r in rows)
    pmis = [r["pmi_e6"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    the_pmis = [
        r["pmi_e6"] for r in rows if "the" in (r["a"], r["b"])
    ]
    assert all(p == 0 for p in the_pmis)


def test_bcubed_eval_hand_computed(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        bcubed_eval,
    )

    # gold {a,a,b,b}; pred merges everything into one cluster:
    # per-element P = 2/4, R = 2/2 -> P=0.5, R=1.0, F1=2/3
    rows = [("a", "x"), ("a", "x"), ("b", "x"), ("b", "x")]
    df = spark.createDataFrame(rows, "gold string, pred string")
    r = bcubed_eval(df).collect()[0]
    assert r["n_items"] == 4
    assert r["bcubed_p_e6"] == 500_000
    assert r["bcubed_r_e6"] == 1_000_000
    assert r["bcubed_f1_e6"] == 666_666

    # perfect clustering -> all 1e6
    rows = [("a", "x"), ("a", "x"), ("b", "y")]
    df = spark.createDataFrame(rows, "gold string, pred string")
    r = bcubed_eval(df).collect()[0]
    assert (
        r["bcubed_p_e6"],
        r["bcubed_r_e6"],
        r["bcubed_f1_e6"],
    ) == (1_000_000, 1_000_000, 1_000_000)

    # pred splits one gold group: P=1, R = (1/2+1/2+1)/3 avg per
    # element: elements of g=a have R=1/2 each, g=b element R=1
    rows = [("a", "x"), ("a", "y"), ("b", "z")]
    df = spark.createDataFrame(rows, "gold string, pred string")
    r = bcubed_eval(df).collect()[0]
    assert r["bcubed_p_e6"] == 1_000_000
    assert r["bcubed_r_e6"] == 666_666


def test_hashed_features_stateless_and_mergeable(spark):
    """The hashing-trick invariants that matter at scale: no fit step
    (same token always lands in the same signed bucket), two corpora
    vectorized independently agree with their union (mergeable), the
    sign hash gives cancellation (a token and its 'negated' collision
    sum, not stack), and zero-sum cells are dropped."""
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        hashed_features,
    )

    a = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "alpha gamma")],
        ["doc_id", "text"],
    )
    b = spark.createDataFrame(
        [(3, "alpha  beta")], ["doc_id", "text"]  # double space -> filtered
    )
    va = hashed_features(a, dim=32).collect()
    vb = hashed_features(b, dim=32).collect()
    vu = hashed_features(a.union(b), dim=32).collect()
    as_map = lambda rows: {  # noqa: E731
        (r["doc_id"], r["dim_idx"]): r["val"] for r in rows
    }
    assert as_map(va) | as_map(vb) == as_map(vu)  # stateless merge

    # same token, same bucket across docs; |val| counts occurrences
    ma = as_map(va)
    alpha_cells = [
        k for k, v in ma.items() if k[0] == 2 and abs(v) == 1
    ]
    assert len(alpha_cells) == 2  # alpha + gamma (no collision at 32)
    beta_cell = [v for (d, _), v in ma.items() if d == 1 and abs(v) == 2]
    assert len(beta_cell) == 1  # beta appears twice -> magnitude 2

    # unsigned mode: all values positive token counts
    vu2 = hashed_features(a, dim=32, signed=False).collect()
    assert all(r["val"] > 0 for r in vu2)
    assert sum(r["val"] for r in vu2) == 5  # total tokens


def test_readability_flesch_contract(spark):
    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        readability_scores,
    )

    rows = [
        (1, "The cat sat. The dog ran! Did it?"),  # 8 words, 3 sentences
        (2, "word " * 4),                          # no punctuation -> 1 sent
        (3, ""),                                   # empty -> null score
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability_scores(df).collect()}

    r1 = got[1]
    assert (r1["n_words"], r1["n_sentences"]) == (8, 3)
    # vowel groups: The(1) cat(1) sat(1) The(1) dog(1) ran(1) Did(1) it(1) = 8
    assert r1["n_syllables"] == 8
    ws = (1000 * 8) // 3          # 2666
    sw = (1000 * 8) // 8          # 1000
    assert r1["flesch_e3"] == 206835 - (1015 * ws) // 1000 - (84600 * sw) // 1000

    assert got[2]["n_sentences"] == 1 and got[2]["n_words"] == 4
    assert got[3]["flesch_e3"] is None


def test_naive_bayes_separable_corpus(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        naive_bayes_classify,
    )

    rows = [
        (1, "spam buy pills now", "spam"),
        (2, "buy spam pills cheap", "spam"),
        (3, "meeting notes agenda", "ham"),
        (4, "agenda for the meeting", "ham"),
        (5, "buy pills", "spam"),
        (6, "notes from the meeting", "ham"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in naive_bayes_classify(df).collect()}
    assert len(got) == 6
    # fully separable vocabulary -> resubstitution is perfect
    assert all(r["predicted"] == r["actual"] for r in got.values())
    # margins are strictly positive for two-class separable data
    assert all(r["margin_e6"] > 0 for r in got.values())
    # deterministic across runs (quantized integer scores)
    again = {r["doc_id"]: r for r in naive_bayes_classify(df).collect()}
    assert got == again

    # single-class corpus: predicted == the class, margin 0
    one = spark.createDataFrame(
        [(1, "a b", "only"), (2, "c d", "only")],
        "doc_id long, text string, source string",
    )
    res = naive_bayes_classify(one).collect()
    assert all(r["predicted"] == "only" and r["margin_e6"] == 0 for r in res)


def test_naive_bayes_class_count_cap(spark):
    # ADVICE r14: the literal-fold scoring path emits one agg column +
    # one array element per class; a high-cardinality label column must
    # refuse loudly instead of building a thousands-of-columns plan.
    import pytest

    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        _NB_MAX_CLASSES,
        naive_bayes_classify,
    )

    rows = [(i, "tok%d common" % i, "cls%04d" % i)
            for i in range(_NB_MAX_CLASSES + 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="distinct classes"):
        naive_bayes_classify(df)


def test_detect_charset_branches():
    from blueforty___etl_data_pipeline_spark.operators.text_ops import (
        detect_charset,
    )

    assert detect_charset(b"plain ascii") == ("ascii", "plain ascii")
    assert detect_charset("héllo".encode("utf-8")) == ("utf-8", "héllo")
    assert detect_charset("x".encode("utf-8-sig") and b"\xef\xbb\xbfx") == (
        "utf-8-sig", "x"
    )
    assert detect_charset("Жуки".encode("utf-16")) == ("utf-16", "Жуки")
    assert detect_charset("Жуки".encode("utf-16-be") and
                          b"\xfe\xff" + "Жуки".encode("utf-16-be")) == (
        "utf-16", "Жуки"
    )
    assert detect_charset("αβ".encode("utf-32")) == ("utf-32", "αβ")
    # invalid UTF-8 falls back to latin-1 (total decode)
    assert detect_charset(b"\xfc42") == ("latin-1", "ü42")
    assert detect_charset(b"\xff\x00\x01") == ("latin-1", "ÿ\x00\x01")


def test_vocabulary_growth_monotone_and_exact(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        vocabulary_growth,
    )

    docs = [
        (0, "a b c"),       # ckpt 1 with span 4, n=2: ids 0,1 -> 1
        (1, "a b d"),
        (2, "d e"),         # ids 2,3 -> ckpt 2
        (3, "a f f"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r["checkpoint"], r["docs_seen"], r["tokens_seen"],
         r["vocab_seen"])
        for r in vocabulary_growth(df, n_checkpoints=2).collect()
    ]
    # ckpt1: docs 0,1 -> 6 tokens, vocab {a,b,c,d}
    # ckpt2: +docs 2,3 -> +5 tokens, new vocab {e,f}
    assert got == [(1, 2, 6, 4), (2, 4, 11, 6)]


def test_ngram_novelty_first_occurrence_attribution(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        ngram_novelty,
    )

    df = spark.createDataFrame(
        [
            (0, "a b c d"),      # shingles abc, bcd — both first here
            (1, "a b c e"),      # abc seen in doc 0; bce novel
            (2, "a b c d"),      # exact repeat: nothing novel
            (3, "x"),            # < 3 tokens: no shingles, drops out
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_permille"])
        for r in ngram_novelty(df).collect()
    }
    assert got == {0: (2, 2, 1000), 1: (2, 1, 500), 2: (2, 0, 0)}


def test_ngram_index_search_token_boundaries(spark):
    import pytest as _pytest

    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        ngram_index_search,
    )

    rows = [
        (1, "the big red fox jumps"),
        (2, "big red foxes everywhere"),      # token-boundary miss
        (3, "a big red fox appears twice big red fox"),
        (4, "nothing relevant"),
        (5, "big  red   fox with odd   spacing"),  # whitespace-normal hit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        r["doc_id"]
        for r in ngram_index_search(df, "big red fox").collect()
    )
    assert got == [1, 3, 5]
    with _pytest.raises(ValueError, match="tokens"):
        ngram_index_search(df, "too short")


def test_rake_keywords_hand_case(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        rake_keywords,
    )

    # doc: "deep learning the deep model a model" ->
    # phrases: "deep learning", "deep model", "model"
    docs = spark.createDataFrame(
        [(1, "deep learning the deep model a model")],
        "doc_id long, text string",
    )
    out = rake_keywords(docs, top_k=10).collect()
    got = {r["phrase"]: (r["n_occurrences"], r["score_e6"]) for r in out}
    # freq/deg: deep: f2 deg 2+2=4 -> 2.0; learning: f1 deg2 -> 2.0;
    # model: f2 deg 2+1=3 -> 1.5
    assert got["deep learning"] == (1, 4000000)
    assert got["deep model"] == (1, 3500000)
    assert got["model"] == (1, 1500000)
    # ranking: highest score first, ties by phrase text
    assert [r["phrase"] for r in out] == [
        "deep learning", "deep model", "model"
    ]


def test_skipgram_pairs_window_and_canonicalization(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        skipgram_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "b a")], "doc_id long, text string"
    )
    out = {
        (r["tok_a"], r["tok_b"]): r["n_cooc"]
        for r in skipgram_pairs(docs, window=2, min_count=1).collect()
    }
    # doc1 pairs within +-2: (a,b) at (0,1),(3,4); (a,c) at (0,2),(2,3);
    # (b,c) at (1,2),(2,4)wait... positions: a0 b1 c2 a3 b4
    # dist1: (a0,b1),(b1,c2),(c2,a3),(a3,b4); dist2: (a0,c2),(b1,a3),(c2,b4)
    # canonical counts: (a,b): a0b1,a3b4,b1a3 =3; (a,c): c2a3,a0c2 =2;
    # (b,c): b1c2,c2b4 =2.  doc2 adds (a,b): +1 -> 4
    assert out == {("a", "b"): 4, ("a", "c"): 2, ("b", "c"): 2}


def test_good_turing_counts_hand_case(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        good_turing_counts,
    )

    # counts: a:3, b:2, c:2, d:1, e:1, f:1 -> N_1=3, N_2=2, N_3=1
    docs = spark.createDataFrame(
        [(1, "a a a b b c c d e f")], "doc_id long, text string"
    )
    out = {r["r"]: r for r in good_turing_counts(docs, max_r=3).collect()}
    assert out[1]["n_r"] == 3 and out[1]["n_r_plus_1"] == 2
    # r*=  (1+1)*N2/N1 = 4/3 -> 1333333
    assert out[1]["r_star_e6"] == (1000000 * 2 * 2) // 3
    # r=2: (3)*N3/N2 = 3/2
    assert out[2]["r_star_e6"] == (1000000 * 3 * 1) // 2
    # r=3: N4=0 -> undefined
    assert out[3]["r_star_e6"] == -1
    # P(unseen) = N1 / tokens = 3/10
    assert all(r["p0_e9"] == 300000000 for r in out.values())


def test_zipf_fit_exact_line(spark):
    import math

    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        zipf_fit,
    )

    # construct counts c = 8, 4, 2, 1 for 4 words: perfect Zipf-like
    # line in log2 space; OLS on e6-floored ln values
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = zipf_fit(docs).collect()[0]
    assert r["n_vocab"] == 4
    xs = [math.floor(1e6 * math.log(i)) for i in (1, 2, 3, 4)]
    ys = [math.floor(1e6 * math.log(c)) for c in (8, 4, 2, 1)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy * sxx - sx * sxy) / (n * sxx - sx * sx)
    assert r["slope_e6"] == math.floor(1e6 * slope)
    assert r["intercept_e6"] == math.floor(intercept)
    # decreasing counts -> negative slope
    assert r["slope_e6"] < 0


def test_term_burstiness_bursty_vs_uniform(spark):
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        term_burstiness,
    )

    # 4 docs: 'u' appears once everywhere (uniform), 'b' appears 4x
    # in one doc only (bursty)
    docs = spark.createDataFrame(
        [(1, "u b b b b"), (2, "u"), (3, "u"), (4, "u")],
        "doc_id long, text string",
    )
    out = {r["tok"]: r for r in
           term_burstiness(docs, min_df=1, top_k=10).collect()}
    # u: counts (1,1,1,1): VMR = 0 (no variance)
    assert out["u"]["vmr_e6"] == 0
    # b: counts (4,0,0,0): N*scc - sc^2 = 4*16-16 = 48; N*sc = 16
    assert out["b"]["vmr_e6"] == (1000000 * 48) // 16
    assert out["b"]["df"] == 1 and out["b"]["total_count"] == 4


def test_oov_rate_hand_case(spark):
    """Vocab at min_count=2: 'a' (3x) and 'b' (2x) are in-vocab; every
    other word is OOV.  src1 = 'a a b' -> 0 permille; src2 = 'a b x y'
    -> 2/4 = 500 permille."""
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        oov_rate,
    )

    df = spark.createDataFrame(
        [("s1", "a a b"), ("s2", "a b x y")],
        "source string, text string",
    )
    out = {r["source"]: r for r in
           oov_rate(df, min_count=2).collect()}
    assert out["s1"]["n_words"] == 3 and out["s1"]["oov_permille"] == 0
    assert out["s2"]["n_words"] == 4 and out["s2"]["n_oov"] == 2
    assert out["s2"]["oov_permille"] == 500


def test_vocabulary_growth_empty_input_emits_no_rows(spark):
    # Round-14 zero-row audit: max(doc_id) is NULL on an empty slice —
    # the checkpoint span must stay valid and the result empty.
    from blueforty___etl_data_pipeline_spark.operators.corpus import (
        vocabulary_growth,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert vocabulary_growth(empty, n_checkpoints=4).count() == 0
