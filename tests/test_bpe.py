"""BPE merge training + segmentation (operators/bpe)."""

import pytest
from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    word_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_counts_filters_and_thresholds(spark):
    docs = _docs(spark, ["low low Low x1 y", "low 42 low!"])
    wc = {
        r["w"]: r["cnt"]
        for r in word_counts(docs, min_count=2).collect()
    }
    # 'Low' lowercases into the count; 'x1'/'42'/'low!' fail the alpha
    # filter; 'y' is below min_count
    assert wc == {"low": 4}


def test_bpe_train_classic_example(spark):
    # Sennrich-style fixture: low ×5, lower ×2, lowest ×1 (all words
    # repeated so min_count keeps them).  Hand-derivable merge order.
    texts = ["low " * 5 + "lower " * 2 + "lowest " * 2]
    merges = bpe_train(
        _docs(spark, texts), num_merges=3, min_count=2
    ).collect()
    got = [(r["step"], r["lhs"], r["rhs"], r["pair_count"]) for r in merges]
    # pair counts over {low:5, lower:2, lowest:2}:
    #   (l,o)=9, (o,w)=9, (w,e)=4, (e,r)=2, (e,s)=2, (s,t)=2
    # step0: tie (l,o)/(o,w) at 9 → lexicographic → (l,o)
    # step1: (lo,w)=9
    # step2: (low,e)=4
    assert got == [
        (0, "l", "o", 9),
        (1, "lo", "w", 9),
        (2, "low", "e", 4),
    ]
    merged = [r["merged"] for r in merges]
    assert merged == ["lo", "low", "lowe"]


def test_bpe_train_greedy_nonoverlapping(spark):
    # 'aaaa': pairs (a,a) ×3 per word; applying merge (a,a) greedily
    # left-to-right gives aa|aa, so the second round merges (aa,aa).
    merges = bpe_train(
        _docs(spark, ["aaaa aaaa"]), num_merges=2, min_count=2
    ).collect()
    got = [(r["step"], r["lhs"], r["rhs"]) for r in merges]
    assert got == [(0, "a", "a"), (1, "aa", "aa")]


def test_bpe_train_stops_when_no_pairs(spark):
    # single-char vocabulary → zero pairs → empty merge table, not an
    # infinite loop
    merges = bpe_train(
        _docs(spark, ["a b a b"]), num_merges=4, min_count=2
    )
    assert merges.count() == 0


def test_bpe_segment_counts(spark):
    texts = ["low " * 5 + "lower " * 2 + "lowest " * 2]
    docs = _docs(spark, texts)
    merges = bpe_train(docs, num_merges=3, min_count=2)
    seg = bpe_segment(docs, merges).collect()
    assert len(seg) == 1
    r = seg[0]
    # after merges [lo, low, lowe]:
    #   low → [low] (1), lower → [lowe, r] (2), lowest → [lowe, s, t] (3)
    assert r["n_words"] == 9
    assert r["n_tokens"] == 5 * 1 + 2 * 2 + 2 * 3


def test_bpe_segment_no_merges_is_char_count(spark):
    docs = _docs(spark, ["ab abc ab abc"])
    empty = bpe_train(docs, num_merges=0)
    seg = bpe_segment(docs, empty).collect()[0]
    assert seg["n_words"] == 4
    assert seg["n_tokens"] == 2 + 3 + 2 + 3
