"""Document-level text analysis operators (north-star extension):
language ID, quality scoring, token counting, fingerprinting.

Thin DataFrame-level wrappers over functions/text.py — all JVM-side
column math, scan-co-located (no shuffle), so they run at corpus scale as
pure map stages.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_MARKERS,
    doc_fingerprint,
    language_scores,
    pii_count,
    quality_features,
    redact_pii,
    token_count_bpeish,
    token_count_ws,
    tokens_ws,
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


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_punct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.0,
) -> DataFrame:
    """Pre-training quality gate: keep documents passing the usual cheap
    heuristics (enough tokens, not punctuation soup, some stopword mass
    — the standard 'looks like prose' proxy).  Pure column predicates on
    the scan — at corpus scale this is a pushdown-friendly map stage
    that typically drops 20-60% of raw crawl before any expensive op.
    Ratio predicates are null-safe: empty docs fail ``min_tokens``
    before the null ratios are consulted."""
    feats = quality_features(F.col(text_col))
    cond = (
        (feats["n_tokens"] >= min_tokens)
        & (feats["punct_ratio"] <= max_punct_ratio)
        & (feats["stopword_ratio"] >= min_stopword_ratio)
    )
    return df.filter(cond)


def assign_packs(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing for LLM training: assign each document to a pack
    of ~``budget`` tokens by cumulative token count over ``id_col``
    order → (id, n_tokens, pack_id).

    Deterministic segmentation: ``pack_id = floor(cumsum_before /
    budget)`` — exact integer math, reproducible by any engine with
    window sums (unlike greedy best-fit bin packing, which is
    inherently sequential-stateful; that variant belongs in
    ``applyInPandasWithState`` if exact-fit packing is required).

    Scale note: a single global cumulative window is one range-shuffle
    that collapses to ONE partition — this form exists as the
    semantics-defining oracle twin only.  Composed pipelines
    (``q_tokenize_pack``, ``q_training_pipeline``) use
    :func:`packs_from_counts` / :func:`assign_packs_scalable`, the
    two-phase distributed prefix sum with identical output.
    """
    from pyspark.sql import Window

    n_tok = token_count_ws(F.col(text_col))
    w = (
        Window.orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = df.select(F.col(id_col), n_tok.alias("n_tokens")).select(
        id_col,
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_before"),
    )
    return with_cum.select(
        id_col,
        "n_tokens",
        F.expr(f"_before div {int(budget)}").alias("pack_id"),
    )


def packs_from_counts(
    df: DataFrame,
    budget: int,
    count_col: str = "n_tokens",
    id_col: str = "doc_id",
    chunk_size: int = 100_000,
) -> DataFrame:
    """Distributed prefix-sum packing over a PRECOMPUTED per-row token
    count — the scale-path core shared by :func:`assign_packs_scalable`
    and the composed tokenize→pack pipelines.  All input columns are
    preserved; adds ``pack_id``.

    Phase 1: contiguous id-range chunks each compute their LOCAL
    cumulative token counts (window partitioned by chunk → fully
    parallel).  Phase 2: per-chunk totals (one tiny row per chunk) get a
    global cumulative sum and broadcast back as chunk offsets; the
    global running total is ``chunk_offset + local_before``.  This is
    the standard distributed prefix-sum shape: the only serial work is
    over the chunk summary (rows ≈ corpus/chunk_size).

    ``pack_id`` uses integer ``div`` on the running sum (not float
    floor), so ids stay exact past 2^53 cumulative tokens.
    """
    from pyspark.sql import Window

    cols = df.columns
    chunked = df.withColumn(
        "_chunk", F.floor(F.col(id_col) / chunk_size)
    )
    w_local = (
        Window.partitionBy("_chunk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = chunked.withColumn(
        "_local_before",
        F.sum(count_col).over(w_local) - F.col(count_col),
    )
    totals = chunked.groupBy("_chunk").agg(
        F.sum(count_col).alias("_chunk_total")
    )
    w_chunks = (
        Window.orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "_chunk",
        (F.sum("_chunk_total").over(w_chunks) - F.col("_chunk_total")).alias(
            "_chunk_offset"
        ),
    )
    return (
        local.join(F.broadcast(offsets), on="_chunk")
        .select(
            *cols,
            F.expr(
                f"(_chunk_offset + _local_before) div {int(budget)}"
            ).alias("pack_id"),
        )
    )


def assign_packs_scalable(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 100_000,
) -> DataFrame:
    """Scalable two-phase version of :func:`assign_packs` — identical
    output (equivalence-tested), no single-partition window over the
    corpus.  Counts whitespace tokens, then delegates the prefix sum to
    :func:`packs_from_counts`.
    """
    counted = df.select(
        F.col(id_col), token_count_ws(F.col(text_col)).alias("n_tokens")
    )
    return packs_from_counts(
        counted, budget, "n_tokens", id_col, chunk_size
    )


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrub pass: emails / SSNs / IPv4s / phone numbers →
    ``<EMAIL>``/``<SSN>``/``<IP>``/``<PHONE>`` placeholders, plus the
    span count found per document (functions/text.PII_PATTERNS).

    Shuffle-free map stage — at 100 TB this runs scan-co-located with
    whatever filter/projection precedes the training-data write."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        redact_pii(t).alias("redacted"),
        pii_count(t).alias("pii_count"),
    )


def word_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document word-repetition statistics (Gopher-style quality
    signals): token count, distinct-token count, type-token ratio, and
    the most frequent word with its frequency fraction.

    Shape: the classic distributed word count — explode to (doc, word),
    hash-aggregate counts (map-side combine collapses each task to its
    local vocabulary before the shuffle), then a second aggregation per
    doc.  Both shuffles carry partially-aggregated rows, so the exchange
    volume is bounded by vocabulary size per task, not token count —
    exactly the plan you want at corpus scale.

    Top-word tiebreak: max(struct(cnt, word)) — highest count, then
    lexicographically largest word (deterministic; oracle mirrors it
    with ORDER BY cnt DESC, word DESC).
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    wc = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("cnt"))
    agg = wc.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max(F.struct("cnt", "word")).alias("_top"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_distinct",
        F.col("_top.word").alias("top_word"),
        F.col("_top.cnt").alias("top_cnt"),
        (F.col("n_distinct") / F.col("n_tokens")).alias("ttr"),
        (F.col("_top.cnt") / F.col("n_tokens")).alias("top_frac"),
    )


def rare_token_stats(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Out-of-vocabulary rate per document against a token keep-list —
    the "rare token ratio" quality signal (documents dominated by tokens
    outside the core vocabulary are typically noise, code, or the wrong
    language).

    ``vocab`` is any DataFrame with a ``token`` column (e.g.
    :func:`~..operators.corpus.build_vocab` output, optionally pruned to
    the top-K ids).  Returns (id, n_tokens, n_oov, oov_permille) with
    ``oov_permille`` an INTEGER fixed-point rate (``n_oov·1000 div
    n_tokens``) so the result hashes identically across engines.

    Scale shape: one explode + a broadcast LEFT join against the (small
    by construction) vocabulary + one per-doc aggregation — the only
    shuffle carries (doc, partial counts).
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens_ws(F.col(text_col))).alias("token")
    )
    keep = vocab.select("token").withColumn("_in_vocab", F.lit(1))
    joined = toks.join(F.broadcast(keep), "token", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).alias(
            "n_oov"
        ),
    ).select(
        id_col,
        "n_tokens",
        "n_oov",
        F.expr("n_oov * 1000 div n_tokens").alias("oov_permille"),
    )


def ngram_model_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Model-based quality scoring as a pure map stage: a hashed
    linear model over character trigrams (the fastText-style shape —
    hash each n-gram into a weight bucket, sum the weights).

    The weight table here is synthetic-but-deterministic
    (``w(b) = (b·2654435761) mod 2001 − 1000``, a Knuth-hash spread
    over [−1000, 1000]) so the whole scorer is engine-reproducible and
    oracle-checkable; a production deployment replaces ``w`` with
    trained weights via a broadcast array lookup — the plan shape does
    not change.

    Everything runs inside whole-stage codegen: trigram enumeration is
    a ``transform(sequence(...))`` over string positions and the dot
    product is an ``aggregate`` fold — no explode (the per-doc shuffle
    a Generate+groupBy scorer would pay), no UDF, no shuffle at all.
    Returns (id, n_ngrams, score), integer-exact.
    """
    b = (
        f"pmod(CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT), "
        f"{n_buckets})"
    )
    w = f"pmod({b} * 2654435761, 2001) - 1000"
    score = (
        f"CASE WHEN length({text_col}) < 3 THEN CAST(0 AS BIGINT) "
        f"ELSE aggregate("
        f"  transform(sequence(1, length({text_col}) - 2), "
        f"            i -> substring({text_col}, i, 3)), "
        f"  CAST(0 AS BIGINT), (acc, g) -> acc + ({w})) END"
    )
    # NULL-text contract (round 14): greatest() ignores NULLs on both
    # engines, so an unguarded n_ngrams would report 0 for a NULL doc;
    # the score fold already propagates NULL (sequence(1, NULL) is
    # NULL).  Both outputs are NULL for NULL text.
    return df.select(
        F.col(id_col),
        F.when(
            F.col(text_col).isNotNull(),
            F.greatest(F.length(F.col(text_col)) - 2, F.lit(0)),
        ).cast("bigint").alias("n_ngrams"),
        F.expr(score).alias("score"),
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats,
    fixed-point ×1e6) — the classic gibberish / degenerate-repetition
    quality signal: near-zero entropy means one token dominates (boiler
    spam, "aaaa…"), high entropy means natural vocabulary spread.

    Engine-exact in two steps: each (doc, token) contributes
    ``FLOOR(1e6 · cnt · ln(n / cnt))`` as an INTEGER, and the final
    ``entropy_e6 = Σ contrib div n`` is integer division — so the
    result never depends on float summation order (raw double sums are
    partition-order-dependent; integer sums are not).

    Shape: word-count hash-agg (map-side combine bounds the shuffle by
    per-task vocabulary), one window over the doc for the token total,
    one final per-doc agg.  Docs with no tokens are absent.
    """
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col), F.explode(tokens_ws(F.col(text_col))).alias("word")
    )
    wc = words.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    n = F.sum("cnt").over(Window.partitionBy(id_col))
    contrib = F.floor(
        F.col("cnt") * F.log(n.cast("double") / F.col("cnt")) * 1e6
    ).cast("bigint")
    per = wc.select(
        F.col(id_col), n.alias("_n"), contrib.alias("_e")
    )
    return per.groupBy(id_col).agg(
        F.max("_n").alias("n_tokens"),
        F.expr("SUM(_e) div MAX(_n)").alias("entropy_e6"),
    )


def bucketed_packs(
    df: DataFrame, budget: int, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed sequence packing — the PARTITIONED form of
    :func:`assign_packs` that the dataloader actually wants: documents
    group into power-of-two token-length buckets (batch-shape
    homogeneity: padding waste is bounded by 2×) and pack ids are a
    per-bucket prefix sum, so the window is partitioned — no global
    single-partition ordering anywhere, the 100 TB-safe packing shape.

    Returns (id, n_tokens, bucket, pack_id) with ``bucket`` the
    power-of-two ceiling of the token count (0 stays 0) and ``pack_id``
    local to the bucket.
    """
    from pyspark.sql import Window

    n_tok = token_count_ws(F.col(text_col))
    # power-of-two ceiling WITHOUT float log (LOG2/POWER round-trips
    # are libm-dependent): ceil_log2(n) = length(bin(n-1)) for n >= 2,
    # exact integer arithmetic in any engine
    b = F.expr(
        "CASE WHEN _n <= 1 THEN _n "
        "ELSE shiftleft(CAST(1 AS BIGINT), length(bin(_n - 1))) END"
    )
    with_b = df.select(F.col(id_col), n_tok.alias("_n")).withColumn(
        "bucket", b
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_b.select(
        id_col,
        F.col("_n").alias("n_tokens"),
        "bucket",
        F.expr(
            f"(SUM(_n) OVER (PARTITION BY bucket ORDER BY {id_col} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - _n) "
            f"div {budget}"
        ).alias("pack_id"),
    )


def augment_word_dropout(
    df: DataFrame,
    rate_permille: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "aug",
) -> DataFrame:
    """Deterministic word-dropout text augmentation — the robustness
    transform training pipelines apply to multiply data (a la EDA /
    SSMBA word dropping), made RNG-FREE: token ``i`` of document ``d``
    drops iff ``md5(salt:d:i) % 1000 < rate_permille``, so the same
    (doc, salt) always yields the same augmented text on every run and
    engine, and different salts give independent augmentation passes
    (generate 3 variants with 3 salts — each is reproducible).

    Returns (id, aug_text, n_tokens, n_dropped).

    Scale shape: a pure map-stage column program — whitespace split,
    one indexed higher-order FILTER whose predicate is the salted md5
    fold, array_join back.  No shuffle, no UDF; augmentation runs at
    scan speed, which is what lets a 100 TB corpus be augmented in the
    same pass that tokenizes it.
    """
    from ..functions.text import md5_hash64, tokens_ws

    toks = tokens_ws(F.col(text_col))
    keep = lambda t, i: (  # noqa: E731
        md5_hash64(
            F.concat(
                F.lit(salt + ":"),
                F.col(id_col).cast("string"),
                F.lit(":"),
                (i + 1).cast("string"),
            )
        )
        % 1000
        >= F.lit(int(rate_permille))
    )
    kept = F.filter(toks, keep)
    # NULL-text contract (round 14): array_join(NULL) is already NULL;
    # array_size propagates NULL for the counts (legacy size's -1
    # would report "-1 tokens" for a NULL doc).
    return df.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("aug_text"),
        F.array_size(toks).cast("bigint").alias("n_tokens"),
        (F.array_size(toks) - F.array_size(kept)).cast("bigint").alias(
            "n_dropped"
        ),
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str = "text_norm",
) -> DataFrame:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the first
    transform of any serious text-corpus pipeline: decomposed accent
    sequences, fullwidth forms, ligatures, and compatibility
    characters otherwise make byte-equal-but-text-identical documents
    slip past exact dedup and inflate the token vocabulary.

    Spark has no built-in normalizer, so this is an Arrow-vectorized
    ``pandas_udf`` over stdlib ``unicodedata`` (batch transfer, never
    row-at-a-time) — one of the few places Python in the hot path is
    the honest choice.  Adds ``out_col`` plus ``was_normalized``
    (did the text change) so downstream dedup can count the gain.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: None
            if t is None
            else unicodedata.normalize(form, t)
        )

    out = df.withColumn(out_col, norm(F.col(text_col)))
    return out.withColumn(
        "was_normalized",
        F.col(out_col).isNotNull()
        & (F.col(out_col) != F.col(text_col)),
    )



def readability_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch Reading Ease per document — the classic readability
    screen (word length / sentence length proxies) used as a cheap
    quality dimension next to :func:`text_quality`.

    Counts are pure JVM regexp folds (scan-speed, zero shuffle):
    words = ``[A-Za-z]+`` runs, sentences = ``[.!?]+`` runs clamped
    to ≥ 1 (corpora stripped of punctuation degrade to one sentence
    per doc rather than dividing by zero), syllables = vowel-group
    runs ``[aeiouyAEIOUY]+`` (the standard cheap approximation).

    Engine-exact fixed point: the two ratios quantize FIRST
    (``r = 1000·a div b``), then scale — ``flesch_e3 = 206835 −
    (1015·r_ws) div 1000 − (84600·r_sw) div 1000`` — a two-level
    floor contract identical on any integer engine (the float
    formula's 206.835 − 1.015·… would hang on multiplication
    rounding).
    """
    # NULL-text contract (round 14): array_size propagates NULL where
    # legacy size yields -1; greatest(NULL, 1) is 1 on both engines,
    # so a NULL doc reports (NULL words, 1 sentence, NULL syllables,
    # NULL flesch) — identical to the SQL oracle.
    words = F.array_size(
        F.expr(f"regexp_extract_all({text_col}, '[A-Za-z]+', 0)")
    )
    sents = F.greatest(
        F.array_size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")),
        F.lit(1),
    )
    syll = F.array_size(
        F.expr(f"regexp_extract_all({text_col}, '[aeiouyAEIOUY]+', 0)")
    )
    return df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        syll.cast("long").alias("n_syllables"),
    ).select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "CAST(CASE WHEN n_words > 0 THEN "
            "206835 - (1015 * ((1000 * n_words) div n_sentences)) div 1000"
            " - (84600 * ((1000 * n_syllables) div n_words)) div 1000 "
            "END AS BIGINT)"
        ).alias("flesch_e3"),
    )


def detect_charset(blob: bytes) -> tuple[str, str]:
    """Charset detection + decode for a raw text blob — the ingest
    normalization every crawl corpus needs before any text operator
    (Spark reads bytes; the wild serves UTF-8, legacy 8-bit, and
    BOM'd UTF-16 side by side).  Detection order, most-specific
    first, all from public encoding specs:

    1. BOMs: UTF-8-sig, UTF-16 LE/BE (UTF-32 BOMs are a UTF-16 BOM
       prefix and are checked first);
    2. strict UTF-8 validation (the only multi-byte encoding whose
       validity is self-evident); pure 7-bit input reports 'ascii';
    3. ISO-8859-1 fallback (total: every byte string decodes).

    Returns ``(charset_label, decoded_text)``.  Deterministic, no
    heuristics beyond the spec checks — the same bytes always yield
    the same label, which is what makes the operator oracle-checkable.
    """
    if blob[:4] in (b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff"):
        label = "utf-32"
        return label, blob.decode("utf-32")
    if blob[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", blob.decode("utf-8-sig")
    if blob[:2] == b"\xff\xfe":
        return "utf-16", blob.decode("utf-16")
    if blob[:2] == b"\xfe\xff":
        return "utf-16", blob.decode("utf-16")
    try:
        text = blob.decode("utf-8")
        return ("ascii" if all(b < 0x80 for b in blob) else "utf-8"), text
    except UnicodeDecodeError:
        return "latin-1", blob.decode("latin-1")


def decode_text_auto(
    media: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Arrow-batched charset triage over a binary column: one row per
    blob with the detected ``charset``, the decoded ``text`` and its
    character length — :func:`detect_charset` per blob inside
    ``mapInPandas``, zero Exchange (pipelines with the scan)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            labels, texts, lens = [], [], []
            for blob in pdf[content_col]:
                label, text = detect_charset(bytes(blob))
                labels.append(label)
                texts.append(text)
                lens.append(len(text))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "charset": labels,
                    "text": texts,
                    "n_chars": lens,
                }
            )

    return media.select(id_col, content_col).mapInPandas(
        run,
        schema=f"{id_col} long, charset string, text string, n_chars int",
    )
