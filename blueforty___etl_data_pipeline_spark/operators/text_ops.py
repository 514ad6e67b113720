"""Document-level text analysis operators (north-star extension):
language ID, quality scoring, token counting, fingerprinting.

Thin DataFrame-level wrappers over functions/text.py — all JVM-side
column math, scan-co-located (no shuffle), so they run at corpus scale as
pure map stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_MARKERS,
    doc_fingerprint,
    language_scores,
    quality_features,
    token_count_bpeish,
    token_count_ws,
)


def text_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len, punct_ratio, stopword_ratio)."""
    feats = quality_features(F.col(text_col))
    return df.select(
        F.col(id_col), *[expr.alias(name) for name, expr in feats.items()]
    )


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace and BPE-ish token counts per document."""
    return df.select(
        F.col(id_col),
        token_count_ws(F.col(text_col)).alias("n_tokens_ws"),
        token_count_bpeish(F.col(text_col)).alias("n_tokens_bpeish"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-lexicon language ID: argmax of per-language hit counts,
    deterministic tiebreak by lexicon order, 'und' when nothing matches."""
    scores = language_scores(F.col(text_col))
    langs = list(LANG_MARKERS)
    best: Column = F.lit("und")
    best_score: Column = F.lit(0).cast("bigint")
    # Fold left-to-right: strictly-greater wins, so earlier langs win ties.
    for lang in langs:
        s = scores[lang]
        is_better = s > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, s).otherwise(best_score)
    return df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        best.alias("lang_pred"),
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, md5 content hash, rolling n-gram fingerprint)."""
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_md5"),
        doc_fingerprint(F.col(text_col), n).alias("fingerprint"),
    )
