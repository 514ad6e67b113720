"""Deduplication operators over document tables (north-star extension;
BASELINE.json).

Four families, in increasing fuzziness:

- exact:          md5-keyed groupBy — one shuffle on the content hash.
- n-gram Jaccard: exact set-similarity via shingle explode + equi-join.
- MinHash + LSH:  shingle → per-doc signature (scan-local array math, NO
                  explode) → band buckets → bucket equi-join.  The scale
                  path: candidate generation never compares all pairs.
- SimHash:        64-bit (here 60-bit) sign-fingerprint; near-dups differ
                  in few bits.

All hashes derive from md5 (functions/text.md5_hash64) so results are
engine-portable and verifiable against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_hash64, ngrams, tokens_ws

#: Mersenne prime 2^31-1 — modulus for the universal-hash family.
MERSENNE31 = 2147483647


def _hash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_k(x) = (a·x + b) mod p — a fixed
    LCG seeds the family so signatures are stable across runs/engines."""
    params = []
    state = 88172645463325252  # fixed seed (xorshift64 state)
    for _ in range(num_hashes):
        state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
        state ^= state >> 7
        state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
        a = state % (MERSENNE31 - 1) + 1
        state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
        state ^= state >> 7
        state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
        b = state % MERSENNE31
        params.append((a, b))
    return params


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate clusters: md5(content) → (hash, canonical id, count).
    One partial-aggregated shuffle keyed on the hash; at 100 TB this is the
    cheapest possible full-corpus dedup."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per distinct content (deterministic
    canonicalization, unlike dropDuplicates which keeps an arbitrary row)."""
    canon = exact_dup_groups(df, text_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(canon, on=id_col, how="inner")


def _rotl60(x: Column, s: int) -> Column:
    """60-bit left rotation via multiply/divide — never exceeds 2^60, so
    it is overflow-safe in engines that range-check shifts (DuckDB).
    The quotient is (x - x%lo)/lo, not x/lo: Spark's ``/`` is a double
    division, and (x - x%lo) is an exact multiple of the power-of-two
    divisor, so the result is exact where a raw x/lo could round."""
    lo = F.lit(1 << (60 - s))
    return (x % lo) * F.lit(1 << s) + ((x - x % lo) / lo).cast("bigint")


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct word-n-gram shingle hashes for one document — the MinHash
    input set.  Array expression: no explode, no shuffle.

    Hashing shape: md5 once per TOKEN, then each shingle hash combines
    its n token hashes with position-dependent 60-bit rotations + XOR.
    The naive alternative — md5 per shingle STRING — costs n× the md5
    work plus a concat_ws string build per shingle; at bench scale the
    token-hash composition halves the whole LSH-pairs wall time.  The
    rotation constants make the combination order-sensitive ('a b c' ≠
    'c b a') and every intermediate stays < 2^60 (portable to the
    DuckDB oracle, which range-checks shifts).

    Single pass: ONE fold over the token hashes carries the previous
    ``n-1`` hashes in the accumulator and emits a shingle per step —
    the token-hash array is evaluated exactly once (any form that
    re-references it inside another lambda re-runs the md5 chain, since
    interpreted higher-order functions do no subexpression caching).
    Currently specialized to the default n=3.
    """
    if n != 3:  # pragma: no cover - trigram shingles are the engine default
        raise NotImplementedError("token-hash shingling is built for n=3")
    th = F.transform(tokens_ws(text), md5_hash64)
    neg = F.lit(-1).cast("bigint")
    init = F.struct(
        neg.alias("a"),  # token hash at i-1
        neg.alias("b"),  # token hash at i-2
        F.array().cast("array<bigint>").alias("res"),
    )
    shingles = F.aggregate(
        th,
        init,
        lambda acc, h: F.struct(
            h.alias("a"),
            acc["a"].alias("b"),
            F.when(
                acc["b"] >= 0,
                F.array_append(
                    acc["res"],
                    _rotl60(acc["b"], 4)
                    .bitwiseXOR(_rotl60(acc["a"], 2))
                    .bitwiseXOR(h),
                ),
            )
            .otherwise(acc["res"])
            .alias("res"),
        ),
        lambda acc: acc["res"],
    )
    return F.array_distinct(shingles)


def minhash_signatures_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """Arrow/NumPy fast path producing BIT-IDENTICAL signatures to
    ``minhash_signatures`` (same tokenization, md5-per-token hashes,
    rotation composition, and (a·x+b) mod p family — parity is asserted
    in tests and by the shared DuckDB oracle).

    Why it exists: the declarative fold runs interpreted (higher-order
    functions don't codegen), ~32 ops per shingle per row in the
    Catalyst interpreter.  Here each Arrow batch does one vectorized
    ``(a⊗x + b) mod p`` min-reduce in NumPy — measured ~3× the fold's
    throughput at bench scale.  Use whichever fits: same results.
    """
    if n != 3:  # pragma: no cover
        raise NotImplementedError("token-hash shingling is built for n=3")
    import re

    params = _hash_params(num_hashes)
    a_vec = [a for a, _ in params]
    b_vec = [b for _, b in params]
    # re.ASCII: Java/RE2 \s is ASCII-only; Python's default matches
    # unicode whitespace and would tokenize differently.
    ws = re.compile(r"\s+", re.ASCII)

    def run(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        a = np.array(a_vec, dtype=np.uint64)
        b = np.array(b_vec, dtype=np.uint64)
        mask60 = (1 << 60) - 1

        def rotl(x: np.ndarray, s: int) -> np.ndarray:
            return ((x << np.uint64(s)) | (x >> np.uint64(60 - s))) & np.uint64(
                mask60
            )

        def sig_of(text: str):
            toks = [t for t in ws.split(text.strip()) if t] if text else []
            if len(toks) < 3:
                return None
            th = np.array(
                [
                    int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                    for t in toks
                ],
                dtype=np.uint64,
            )
            sh = rotl(th[:-2], 4) ^ rotl(th[1:-1], 2) ^ th[2:]
            x = np.unique(sh) % np.uint64(MERSENNE31)
            # (a ⊗ x + b) mod p: outer product stays < 2^62 — fits uint64
            hx = (np.outer(x, a) + b) % np.uint64(MERSENNE31)
            return hx.min(axis=0).astype(np.int64).tolist()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "minhash_sig": pdf[text_col].map(sig_of),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, minhash_sig array<bigint>"
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """Per-document MinHash signature as ``array<bigint>`` of length
    ``num_hashes``.

    Everything is per-row array math, so signature computation is
    embarrassingly parallel and shuffle-free — the property that makes
    MinHash viable on a 100 TB corpus.  Empty docs get a null signature
    (filtered before LSH).

    Single pass: ONE fold over the shingle hashes carries all
    ``num_hashes`` running minima (the naive per-hash
    ``array_min(transform(...))`` form makes Catalyst inline — and
    therefore re-evaluate — the whole tokenize→shingle→md5 chain once per
    hash function: ~60× the md5 work and a 50× wall-time regression at
    bench scale).
    """
    params = _hash_params(num_hashes)
    a_arr = F.array(*[F.lit(a).cast("bigint") for a, _ in params])
    b_arr = F.array(*[F.lit(b).cast("bigint") for _, b in params])
    base = shingle_hashes(F.col(text_col), n)
    # h mod p once, then each h_k is (a·x + b) mod p with x < 2^31 —
    # products stay under 2^62, no bigint overflow.
    reduced = F.transform(base, lambda h: h % F.lit(MERSENNE31))
    init = F.array_repeat(F.lit(MERSENNE31).cast("bigint"), num_hashes)
    sig = F.aggregate(
        reduced,
        init,
        lambda acc, x: F.zip_with(
            acc,
            F.zip_with(
                a_arr, b_arr, lambda a, b: (a * x + b) % F.lit(MERSENNE31)
            ),
            lambda u, v: F.least(u, v),
        ),
    )
    return df.select(
        F.col(id_col),
        F.when(F.size(base) > 0, sig).alias("minhash_sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """LSH candidate pairs: split each signature into ``bands`` bands of
    ``num_hashes/bands`` rows, hash each band to a bucket key, explode to
    (band, bucket) rows, and self-equi-join on the bucket.

    ``impl``: 'arrow' (default — vectorized NumPy mapInPandas, ~4.5×
    throughput at sf0.1) or 'expr' (pure JVM column fold, bit-identical
    signatures; the no-Arrow fallback — see minhash_signatures_arrow).

    Scale shape: the explode adds only ``bands`` rows per doc; the join is
    a hash join on (band, bucket) — candidates are generated per bucket,
    never all-pairs.  Giant buckets (degenerate content, e.g. billions of
    empty-ish docs sharing a band) are the skew risk: AQE skew-join
    handles moderate cases, and ``max_bucket_size`` drops buckets larger
    than the cap before the join (a bucket of size m contributes m²/2
    candidate pairs — at 100 TB one degenerate bucket can dominate the
    whole job; its members are still paired through their other,
    non-degenerate bands).
    """
    make_sigs = (
        minhash_signatures_arrow if impl == "arrow" else minhash_signatures
    )
    sigs = make_sigs(df, text_col, id_col, n, num_hashes).filter(
        F.col("minhash_sig").isNotNull()
    )
    # The bucket join is a SELF-join: without materialization both sides
    # re-run the tokenize→shingle→md5→fold signature computation.
    # Persist (columnar cache), NOT localCheckpoint: the row-serialized
    # checkpoint costs ~2× on this hot path (A/B-measured at sf0.1).
    # CACHE LIFETIME CONTRACT: the cache lives until the session drops
    # it — a caller looping this operator in one long-lived session
    # should spark.catalog.clearCache() between batches (at corpus
    # scale you would checkpoint signatures to storage instead).
    sigs = sigs.persist()
    banded = _banded_buckets(sigs, id_col, num_hashes, bands)
    if max_bucket_size is not None:
        small = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .drop("_n")
        )
        banded = banded.join(small, on=["band", "bucket"], how="left_semi")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def _shingle_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    cap: int | None,
) -> tuple[DataFrame, DataFrame | None]:
    """(id, set_size, sh) exploded shingle rows for the exact pair
    operators — sized map-side and, when ``cap`` is set, hot-shingle
    filtered on the SAME exchange the pair self-join uses.

    The cap is the candidate-volume guard: a shingle shared by c
    documents generates O(c²) join pairs, so one degenerate
    boilerplate shingle (a license header, a template footer) can
    dwarf the entire join.  Shingles whose document count exceeds
    ``cap`` are excluded from pair generation (the classic
    stop-shingle rule — ultra-common shingles carry ~no similarity
    signal), and the number dropped is returned as a one-row frame so
    callers surface the drop EXPLICITLY instead of silently
    under-counting.

    Two fusions over the naive three-pass form:

    - ``set_size`` is ``size(shingle_hashes(...))`` evaluated in the
      scan projection (the shingle array is distinct by construction),
      so the per-doc groupBy shuffle and the downstream sizes joins
      disappear — the true set size rides along every exploded row.
    - the hot-shingle count is a count window over hash-partitioning
      by ``sh`` — exactly the partitioning both sides of the pair
      self-join need — so ONE exchange of the exploded table feeds the
      cap filter, the dropped-shingles report, and (via ReusedExchange
      + preserved output partitioning) the join itself.  The previous
      form paid a second full shuffle for a separate
      ``groupBy("sh")`` count pass.

    The window buffers one shingle's rows per group; a degenerate
    boilerplate shingle spills rather than OOMs (WindowExec is
    spill-aware), and its rows are dropped right after counting.
    """
    arr = df.select(
        F.col(id_col), shingle_hashes(F.col(text_col), n).alias("_arr")
    )
    sh = arr.select(
        F.col(id_col),
        F.size("_arr").alias("set_size"),
        F.explode("_arr").alias("sh"),
    )
    if cap is None:
        return sh, None
    from pyspark.sql import Window

    part = sh.repartition("sh").withColumn(
        "_c", F.count(F.lit(1)).over(Window.partitionBy("sh"))
    )
    kept = part.filter(F.col("_c") <= cap).drop("_c")
    # The dropped-count branch deliberately REFERENCES id and set_size
    # (max-folded away) so column pruning leaves its exchange subtree
    # canonically identical to the join sides' — that is what lets
    # ReusedExchange collapse all of them into one physical shuffle.
    # A plain .select("sh").distinct() here prunes the other columns
    # below the exchange and forfeits the reuse.
    dropped = (
        part.filter(F.col("_c") > cap)
        .groupBy("sh")
        .agg(
            F.max(F.col(id_col)).alias("_i"),
            F.max("set_size").alias("_s"),
        )
        # n_shingles_dropped == count(*); the CASE on min(_s) (always
        # true: set sizes are positive, and both branches agree anyway)
        # exists only to keep _i/_s REFERENCED so the optimizer cannot
        # prune them — pruning would shrink this branch's exchange
        # projection below [id, set_size, sh] and break the canonical
        # equality that lets it reuse the join sides' shuffle.
        .agg(
            F.when(F.min("_s") >= 0, F.count(F.lit(1)))
            .otherwise(F.count(F.least("_i", "_s")))
            .alias("n_shingles_dropped")
        )
    )
    return kept, dropped


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_candidates_per_shingle: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    Explode distinct shingles, self-join on the shingle hash, count common
    shingles per pair, Jaccard = |∩| / (|A|+|B|-|∩|).  Quadratic in the
    worst case — this is the ground-truth/verification operator; MinHash
    LSH above is the scale path.  Jaccard is a ratio of exact integers, so
    thresholding is engine-deterministic.

    ``max_candidates_per_shingle`` bounds the per-shingle join volume
    (analog of LSH's ``max_bucket_size``): shingles shared by more
    documents than the cap are dropped from pair generation, the
    output gains a constant ``n_shingles_dropped`` column reporting
    how many, and set sizes stay TRUE sizes — capped Jaccard is
    therefore a lower bound, never an overestimate.  Default ``None``
    keeps the exact uncapped semantics (and the uncapped schema).
    """
    sh, dropped = _shingle_rows(
        df, text_col, id_col, n, max_candidates_per_shingle
    )
    a = sh.alias("a")
    b = sh.alias("b")
    out = (
        a.join(
            b,
            on=[
                F.col("a.sh") == F.col("b.sh"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        # set sizes are functionally dependent on the ids, so folding
        # them into the grouping key replaces the two sizes joins of
        # the naive form with zero extra work
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if dropped is not None:
        out = out.crossJoin(F.broadcast(dropped))
    return out


def simhash_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 60,
) -> DataFrame:
    """Arrow/NumPy SimHash producing BIT-IDENTICAL fingerprints to
    ``simhash64`` (same tokenization and md5-per-token hashing; parity
    asserted in tests).  Vectorized bit-balance: one (tokens × bits)
    sign matrix reduce per document instead of the interpreted fold."""
    import re

    ws = re.compile(r"\s+", re.ASCII)

    def run(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        bit_idx = np.arange(n_bits, dtype=np.uint64)
        pow2 = (np.uint64(1) << bit_idx).astype(np.int64)

        def fp_of(text: str) -> int | None:
            # NULL-text contract (round 14): NULL in, NULL out —
            # parity with simhash64's fold (NULL array propagates).
            if text is None:
                return None
            toks = [t for t in ws.split(text.strip()) if t]
            if not toks:
                return 0
            th = np.array(
                [
                    int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                    for t in toks
                ],
                dtype=np.uint64,
            )
            bits = ((th[:, None] >> bit_idx) & np.uint64(1)).astype(np.int64)
            balances = (bits * 2 - 1).sum(axis=0)
            return int(pow2[balances > 0].sum())

        for pdf in batches:
            # Explicit nullable Int64: once a None lands in the batch,
            # a mapped object column can round-trip through float64 and
            # CORRUPT 60-bit fingerprints (>2^53 loses low bits —
            # caught by the round-14 null audit as one-off hammings).
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "simhash": pd.array(
                        [fp_of(t) for t in pdf[text_col]], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, simhash long"
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 60,
    max_hamming: int = 3,
    bands: int = 4,
    impl: str = "arrow",
) -> DataFrame:
    """SimHash near-dup pairs: candidates via band-bucket equi-join,
    verified by exact Hamming distance.  ``impl``: 'arrow' (default —
    vectorized NumPy, ~3× the fold) or 'expr' (pure-JVM fold,
    bit-identical fingerprints; the no-Arrow fallback).

    Pigeonhole blocking: two fingerprints within ``max_hamming`` bits of
    each other agree exactly on at least one of ``bands`` bit-bands when
    ``max_hamming < bands``, so bucketing each band and equi-joining
    finds every qualifying pair WITHOUT the n² cross product — and the
    ``bit_count(a XOR b)`` filter makes precision exact.
    """
    assert max_hamming < bands, "pigeonhole guarantee needs max_hamming < bands"
    width = n_bits // bands
    mask = (1 << width) - 1
    # Persisted (columnar cache — the row-serialized localCheckpoint
    # alternative costs ~4× here, A/B-measured): the band join is a
    # self-join, and the fingerprint fold would otherwise run once per
    # side.  Same caller-owned cache-lifetime contract as
    # minhash_lsh_pairs.
    if impl == "arrow":
        sh = simhash_arrow(df, text_col, id_col, n_bits).persist()
    else:
        sh = df.select(
            F.col(id_col), simhash64(F.col(text_col), n_bits).alias("simhash")
        ).persist()
    banded = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * width).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    left, right = banded.alias("l"), banded.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash64(text: Column, n_bits: int = 60) -> Column:
    """SimHash fingerprint: per-token 60-bit hashes vote on each bit
    position; the sign of each bit's balance forms the fingerprint.
    Near-duplicate texts differ in O(few) bits (compare via
    bit_count(a XOR b)).  Pure array math per row.

    Single pass: ONE fold over the token hashes accumulates all ``n_bits``
    bit balances as an int array (each step is a ``zip_with`` update), then
    one final pass turns balance signs into the fingerprint — O(tokens ×
    bits) work total, vs. the naive per-bit re-scan which is the same
    asymptotics but ``n_bits`` separate array traversals of the hash list.
    """
    hashes = F.transform(tokens_ws(text), md5_hash64)
    pow2 = F.array(*[F.lit(1 << i).cast("bigint") for i in range(n_bits)])
    zeros = F.array(*[F.lit(0) for _ in range(n_bits)])
    balances = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            pow2,
            lambda a, p: a
            + F.when(h.bitwiseAND(p) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            balances,
            pow2,
            lambda bal, p: F.when(bal > 0, p).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def deletion_variants(key: Column) -> Column:
    """``key`` plus every one-character-deleted form of it — the
    SymSpell blocking set.  Two strings at Levenshtein distance ≤ 1
    ALWAYS share a variant (substitution at i → both delete i;
    insertion/deletion → the shorter string is itself a variant of the
    longer), so joining on variants is a complete distance-1 blocker.
    |variants| = len(key) + 1 per row.
    """
    return F.concat(
        F.array(key),
        F.transform(
            F.sequence(F.lit(1), F.length(key)),
            lambda i: F.concat(
                F.substr(key, F.lit(1), i - 1),
                F.substr(key, i + 1, F.length(key) - i),
            ),
        ),
    )


def fuzzy_key_pairs(
    df: DataFrame,
    key_col: str = "key",
    id_col: str = "id",
) -> DataFrame:
    """Entity-resolution / typo-dedup join: all pairs of rows whose keys
    are within Levenshtein distance 1, WITHOUT a cross join.

    Blocking: explode each key's deletion neighborhood (len+1 variants,
    md5-hashed to 8 bytes), self-equi-join on the variant hash, distinct
    the candidate pairs, then verify exactly with ``levenshtein`` —
    collisions and distance-2 coincidences are filtered here.  Complete
    for distance ≤ 1 (see :func:`deletion_variants`).

    Scale shape: candidate generation is an equi-join on a high-
    cardinality hash — shuffle volume is (len+1)·8 bytes per row, and
    the cross product never materializes.  The expensive exact
    ``levenshtein`` runs only on candidates, not on all pairs.

    Returns (id_a, id_b, key_a, key_b, dist) with id_a < id_b.
    """
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).alias("_key"),
        F.explode(deletion_variants(F.col(key_col))).alias("_v"),
    ).select("_id", "_key", md5_hash64(F.col("_v")).alias("_vh"))
    a = v.select(
        F.col("_vh"),
        F.col("_id").alias("id_a"),
        F.col("_key").alias("key_a"),
    )
    b = v.select(
        F.col("_vh"),
        F.col("_id").alias("id_b"),
        F.col("_key").alias("key_b"),
    )
    cand = (
        a.join(b, on="_vh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "key_a", "key_b")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        "key_a",
        "key_b",
        F.levenshtein("key_a", "key_b").cast("int").alias("dist"),
    ).filter(F.col("dist") <= 1)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash every
    word ``k``-gram, slide a ``window`` over the hash sequence, and
    select each window's minimum (rightmost on ties).  The selection
    guarantee: any shared token run of at least ``window + k − 1``
    tokens between two documents yields at least one shared
    fingerprint — so a fingerprint equi-join finds partial-overlap
    plagiarism/boilerplate that whole-document hashing misses, at
    ~1/((window+1)/2) the volume of full k-gram shingling.

    Documents with fewer than ``window`` k-grams emit the minimum of
    what they have (one fingerprint); empty/sub-k docs emit none.
    Returns distinct (id, pos, fp_hash) — pos is the 1-based k-gram
    index of the selected hash (adjacent windows picking the same
    position collapse, per the paper).

    Scale shape: per-row array expressions (no shuffle) → posexplode →
    ONE distinct.  Output rows ≈ 2·tokens/(window+1).
    """
    th = F.transform(
        ngrams(tokens_ws(F.col(text_col)), k), md5_hash64
    )

    def fps_of(gh: Column) -> Column:
        m = F.size(gh)
        we = F.least(F.lit(window), m)
        starts = F.when(
            m <= 0, F.array().cast("array<int>")
        ).otherwise(F.sequence(F.lit(1), (m - we + 1).cast("int")))

        def fp_at(i: Column) -> Column:
            win = F.slice(gh, i, window)
            mn = F.array_min(win)
            posrev = F.array_position(F.reverse(win), mn)
            return F.struct(
                (i.cast("bigint") + F.size(win) - posrev).alias("pos"),
                mn.alias("fp_hash"),
            )

        return F.transform(starts, fp_at)

    # bind the gram-hash array ONCE (single-element transform wrapper;
    # same HOF-inlining trap as functions/text.ngrams)
    fps = F.flatten(F.transform(F.array(th), fps_of))
    return (
        df.select(F.col(id_col), F.explode(fps).alias("f"))
        .select(
            id_col,
            F.col("f.pos").alias("pos"),
            F.col("f.fp_hash").alias("fp_hash"),
        )
        .distinct()
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    mask_bits: int = 6,
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/FastCDC discipline):
    cut a document into chunks wherever the hash of the LOCAL
    ``window``-gram fires (``h % 2^mask_bits == 0`` → expected chunk
    ≈ 2^mask_bits tokens), so boundaries depend only on nearby
    content.  The property fixed-size chunking lacks: inserting one
    token shifts every fixed-size boundary after it, but CDC
    boundaries outside the edit's ±window neighborhood are UNCHANGED —
    chunk-hash dedup keeps matching the untouched remainder
    (unit-tested).  This is byte-level-dedup's token-level analog and
    the storage-dedup complement of :func:`duplicate_spans`.

    Returns one row per chunk: (id, chunk_idx, start_tok, n_toks,
    chunk_hash, n_copies) — n_copies counts corpus-wide occurrences of
    the chunk hash.  Docs shorter than ``window`` grams form a single
    chunk; empty docs emit none.

    Scale shape: boundaries/slices/hashes are per-row array
    expressions (token and gram-hash arrays each bound ONCE via the
    array-wrapper — the HOF-inlining trap); one posexplode; the only
    shuffle is the chunk-hash window for the dedup count."""
    m_mask = 1 << mask_bits

    def per_th(th: Column, arr: Column) -> Column:
        m = F.size(arr)
        cuts = F.filter(
            F.transform(
                th,
                lambda x, i: F.when(
                    x % m_mask == 0, (i + window).cast("int")
                ),
            ),
            lambda c: c.isNotNull() & (c < m),
        )
        starts = F.concat(F.array(F.lit(0)), cuts)
        ends = F.concat(cuts, F.array(m.cast("int")))

        def chunk_at(j: Column) -> Column:
            s = F.element_at(starts, j)
            e = F.element_at(ends, j)
            return F.struct(
                (j - 1).cast("int").alias("chunk_idx"),
                s.cast("int").alias("start_tok"),
                (e - s).cast("int").alias("n_toks"),
                F.md5(F.concat_ws(" ", F.slice(arr, s + 1, e - s))).alias(
                    "chunk_hash"
                ),
            )

        return F.transform(F.sequence(F.lit(1), F.size(starts)), chunk_at)

    def per_doc(arr: Column) -> Column:
        th = F.transform(ngrams(arr, window), md5_hash64)
        return F.flatten(
            F.transform(F.array(th), lambda t: per_th(t, arr))
        )

    chunks = F.flatten(
        F.transform(F.array(tokens_ws(F.col(text_col))), per_doc)
    )
    exploded = (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(id_col, "c.*")
        .filter(F.col("n_toks") > 0)
    )
    w = Window.partitionBy("chunk_hash")
    return exploded.withColumn(
        "n_copies", F.count(F.lit(1)).over(w)
    )


def jaccard_prefix_join(
    df: DataFrame,
    t_num: int = 19,
    t_den: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT token-set similarity self-join via prefix filtering — the
    scalable exact counterpart to :func:`ngram_jaccard_pairs` (which
    joins on EVERY shared shingle) and to MinHash-LSH (which is only
    probabilistically complete).

    Classic SSJoin/PPJoin prefix filter: order every document's distinct
    tokens by global rarity (document frequency asc, token asc); if
    Jaccard(A,B) ≥ t then |A∩B| ≥ t·|A| — so A's FIRST
    ``|A| − ⌈t·|A|⌉ + 1`` tokens (its *prefix*) must intersect B's
    prefix under the shared order.  Candidates are generated by an
    equi-join on prefix tokens only, then verified with exact integer
    intersection counts.  The threshold is the rational ``t_num/t_den``
    and the test is ``t_den·|∩| ≥ t_num·|∪|`` — no float ever decides
    membership, so results are engine-exact (the DuckDB oracle runs the
    EXHAUSTIVE all-shared-token join and must produce the identical
    pair set, proving the prefix filter loses nothing).

    Scale shape: prefix tokens are the RAREST tokens, so each join
    bucket is small by construction on natural corpora (frequency-skew
    is what makes this work at web scale — the head words never enter a
    prefix at high t).  The global rarity order is SORT-FREE: each
    token's sort key is the ``(tok_df, token)`` struct itself (struct
    comparison is lexicographic by field, identical to ranking by
    df-asc, token-asc), so no single-task ``row_number`` window ever
    runs and the vocabulary is never ranked globally.  The toks⋈rarity
    join is a plain equi-join — AQE broadcasts it when the vocabulary
    is small and falls back to a shuffle join on web-scale
    vocabularies, so there is no driver-sized broadcast either.
    Everything else is equi-joins and partial-agged counts.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens_ws(F.col(text_col))).alias("token")
    ).distinct()
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))

    rarity = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("tok_df")
    )
    ranked = toks.join(rarity, "token")
    per_doc = ranked.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("tok_df"), F.col("token")))
        ).alias("arr"),
        F.count(F.lit(1)).alias("s"),
    )
    # prefix_len = s - ceil(t*s) + 1, all-integer ceil
    prefix_len = (
        F.col("s")
        - F.expr(f"({t_num} * s + {t_den} - 1) div {t_den}")
        + F.lit(1)
    ).cast("int")
    prefix = per_doc.select(
        F.col(id_col),
        F.col("s"),
        F.explode(F.slice(F.col("arr"), F.lit(1), prefix_len)).alias("p"),
    ).select(F.col(id_col), F.col("s"), F.col("p.token").alias("token"))
    a = prefix.alias("a")
    b = prefix.alias("b")
    # Size filter (PPJoin): Jaccard ≥ t ⟹ t·|A| ≤ |B| and t·|B| ≤ |A|;
    # applied inside the candidate join so incompatible-length pairs
    # never materialize.
    cand = (
        a.join(
            b,
            on=[
                F.col("a.token") == F.col("b.token"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
                F.lit(t_num) * F.col("a.s") <= F.lit(t_den) * F.col("b.s"),
                F.lit(t_num) * F.col("b.s") <= F.lit(t_den) * F.col("a.s"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    ta = toks.select(F.col(id_col).alias("id_a"), "token")
    tb = toks.select(F.col(id_col).alias("id_b"), "token")
    common = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    uni = F.col("size_a") + F.col("size_b") - F.col("n_common")
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.lit(t_den) * F.col("n_common") >= F.lit(t_num) * uni)
        .select(
            "id_a",
            "id_b",
            "n_common",
            "size_a",
            "size_b",
            F.expr(
                "1000 * n_common div (size_a + size_b - n_common)"
            ).alias("jaccard_permille"),
        )
    )


def _span_hashes(
    df: DataFrame,
    window: int,
    stride: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(id, span_idx, span_h) for every full ``window``-token span at
    ``stride``-token steps.  Docs shorter than ``window`` tokens emit no
    spans.  The token array is bound ONCE as a lambda variable (the
    HOF-inlining trap: naive per-span tokenization re-splits the whole
    document per span — quadratic on long web documents)."""

    def spans_of(arr: Column) -> Column:
        n = F.size(arr)
        n_spans = F.when(
            n >= window,
            (F.floor((n - F.lit(window)) / F.lit(stride)) + 1).cast("int"),
        ).otherwise(F.lit(0))
        return F.when(
            n_spans <= 0, F.array().cast("array<bigint>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: md5_hash64(
                    F.concat_ws(
                        " ", F.slice(arr, i * F.lit(stride) + 1, window)
                    )
                ),
            )
        )

    hashed = F.flatten(
        F.transform(F.array(tokens_ws(F.col(text_col))), spans_of)
    )
    return df.select(
        F.col(id_col), F.posexplode(hashed).alias("span_idx", "span_h")
    ).select(
        F.col(id_col),
        F.col("span_idx").cast("long").alias("span_idx"),
        "span_h",
    )


def duplicate_spans(
    df: DataFrame,
    window: int = 16,
    stride: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level EXACT duplicate detection — the substring-granularity
    member of the dedup family (doc-level: exact_dup_groups; near-dup:
    MinHash/SimHash).  Training corpora are full of cross-document
    boilerplate (headers, licenses, navigation) that document-level
    dedup cannot see; this is the Spark-native shape of the
    "deduplicating training data" span approach: every ``window``-token
    span (``stride``-token steps) is hashed, and spans whose hash occurs
    in ≥ ``min_docs`` DISTINCT documents are flagged with their
    positions → (id, span_idx, span_h, n_docs).

    Scale shape: the explode emits ~n_tokens/stride rows per doc; the
    sharer count is a partial-agged distinct on (span_h, doc) followed
    by a hash-agg on span_h — shuffles keyed on the span hash, which is
    uniform by construction (no skew).  The final join back is an
    equi-join on span_h; candidates never pair up docs directly, so
    there is no quadratic blowup anywhere.  True suffix-array substring
    dedup finds *maximal* repeats; fixed windows + stride trade that
    exactness for a pure hash-agg plan that scales linearly.
    """
    spans = _span_hashes(df, window, stride, text_col, id_col)
    sharers = (
        spans.select("span_h", id_col)
        .distinct()
        .groupBy("span_h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return spans.join(sharers, "span_h").select(
        id_col, "span_idx", "span_h", "n_docs"
    )


def span_dup_stats(
    df: DataFrame,
    window: int = 16,
    stride: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-span fraction — the boilerplate /
    memorization-risk quality signal built on :func:`duplicate_spans`:
    (id, n_spans, n_dup_spans, dup_permille), integer permille so both
    engines agree exactly.  Docs shorter than ``window`` tokens emit no
    spans and are absent (they carry no signal).

    Use as a quality-filter input: a doc whose spans are mostly shared
    with other documents is template debris, not content.
    """
    spans = _span_hashes(df, window, stride, text_col, id_col)
    sharers = (
        spans.select("span_h", id_col)
        .distinct()
        .groupBy("span_h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("span_h")
    )
    flagged = spans.join(
        sharers.withColumn("_dup", F.lit(1)), "span_h", "left"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0)))
            .cast("long")
            .alias("n_dup_spans"),
        )
        .select(
            id_col,
            "n_spans",
            "n_dup_spans",
            F.expr("1000 * n_dup_spans div n_spans").alias("dup_permille"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    window: int = 16,
    stride: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The REWRITE step of exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"):
    :func:`duplicate_spans` finds cross-document boilerplate; this
    removes it — every token covered by a duplicated span is dropped
    and the survivors are reassembled in order.

    Returns (id, clean_text, n_tokens, n_removed) for EVERY input doc
    (docs with no duplicated spans pass through with n_removed = 0).

    Scale shape: the only shuffles are the span-sharer hash-agg
    inherited from duplicate_spans plus one equi-join of the per-doc
    duplicated-span-index arrays back onto the doc table; the coverage
    test and reassembly are a single map-side higher-order-function
    pass (per-token cost is O(dup spans in the doc), and a doc has at
    most n_tokens/stride spans).  No per-position explode of the
    coverage set ever hits a shuffle.
    """
    spans = duplicate_spans(df, window, stride, min_docs, text_col, id_col)
    dup_idx = spans.groupBy(id_col).agg(
        F.array_sort(F.collect_set("span_idx")).alias("_dup_idx")
    )
    toks = df.select(
        F.col(id_col), tokens_ws(F.col(text_col)).alias("_toks")
    )
    j = toks.join(dup_idx, id_col, "left").withColumn(
        "_dup_idx",
        F.coalesce(F.col("_dup_idx"), F.array().cast("array<bigint>")),
    )
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~F.exists(
            F.col("_dup_idx"),
            lambda s: (i >= s * stride) & (i <= s * stride + (window - 1)),
        ),
    )
    # NULL-text contract (round 14): a NULL doc yields NULL clean_text
    # (concat_ws would silently turn a NULL token array into ''),
    # NULL n_tokens and NULL n_removed (array_size, not legacy size).
    return j.select(
        F.col(id_col),
        F.when(
            F.col("_toks").isNotNull(), F.concat_ws(" ", kept)
        ).alias("clean_text"),
        F.array_size("_toks").cast("long").alias("n_tokens"),
        (F.array_size("_toks") - F.array_size(kept)).cast("long").alias(
            "n_removed"
        ),
    )


def _banded_buckets(
    sigs: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, bucket) rows from a (id, minhash_sig) table: each
    signature splits into ``bands`` row-slices, each slice md5-hashed to
    a bucket key.  Shared by the self-join (minhash_lsh_pairs) and
    incremental (lsh_dedup_incremental) LSH shapes."""
    rows = num_hashes // bands
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("minhash_sig"), b * rows + 1, rows
                            ),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )


def lsh_dedup_incremental(
    df_new: DataFrame,
    df_corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    impl: str = "arrow",
) -> DataFrame:
    """Incremental ingest dedup: drop every NEW document that LSH-
    collides with the EXISTING corpus — the production shape for a
    continuously-fed training corpus, where each arriving batch dedups
    against everything already accepted rather than re-pairing the whole
    lake.

    Candidates come from an equi-join of the new batch's band buckets
    against the corpus's band buckets (never new × corpus all-pairs); a
    left-semi collapses multi-band hits, and a left-anti keeps the
    survivors.  Candidate-level filtering is deliberate: at the banded
    (num_hashes/bands-row) threshold a bucket collision IS the near-dup
    signal, and erring toward dropping a borderline new doc is the safe
    direction for training data (recall over precision).  Chain
    ``ngram_jaccard_pairs`` on the flagged subset if exact verification
    is required.

    At 100 TB the corpus side is the PRECOMPUTED signature/bucket table
    you maintain as an index (persist + checkpoint of ``_banded_buckets``
    output, partitioned by bucket); only the new batch computes
    signatures per ingest.  Returns the surviving rows of ``df_new``.
    """
    make_sigs = (
        minhash_signatures_arrow if impl == "arrow" else minhash_signatures
    )
    sig_new = make_sigs(df_new, text_col, id_col, n, num_hashes).filter(
        F.col("minhash_sig").isNotNull()
    )
    sig_old = make_sigs(df_corpus, text_col, id_col, n, num_hashes).filter(
        F.col("minhash_sig").isNotNull()
    )
    banded_new = _banded_buckets(sig_new, id_col, num_hashes, bands)
    banded_old = _banded_buckets(
        sig_old, id_col, num_hashes, bands
    ).select("band", "bucket")
    doomed = (
        banded_new.join(banded_old, on=["band", "bucket"], how="left_semi")
        .select(id_col)
        .distinct()
    )
    return df_new.join(doomed, on=id_col, how="left_anti")


def dup_weights(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SOFT dedup: instead of dropping exact duplicates, weight each
    row by the inverse of its duplicate-cluster size
    (``weight_permille = 1000 div dup_count``) so every distinct
    content contributes equal total loss mass during training —
    preserves natural-distribution signal that hard dedup destroys
    (duplicated text is often *popular* text).

    Returns (id, dup_count, weight_permille) for every input row —
    including NULL-text rows, which hash a sentinel and so form their
    own duplicate cluster instead of silently dropping out of the
    null-unsafe equi-join below.

    Scale shape: the same single hash-keyed partial-agg shuffle as
    :func:`exact_dup_groups`, plus one equi-join of the (content_hash,
    count) table back onto the hashed rows.
    """
    hashed = df.select(
        F.md5(
            F.coalesce(F.col(text_col), F.lit("\x00__null_text__"))
        ).alias("content_hash"),
        F.col(id_col),
    )
    counts = hashed.groupBy("content_hash").agg(
        F.count(F.lit(1)).alias("dup_count")
    )
    return hashed.join(counts, on="content_hash").select(
        id_col,
        "dup_count",
        F.expr("1000 div dup_count").alias("weight_permille"),
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_permille: int = 800,
    min_shingles: int = 5,
    max_candidates_per_shingle: int | None = None,
) -> DataFrame:
    """ASYMMETRIC containment pairs: ``|A∩B| / |A| ≥ threshold`` flags
    documents whose shingle set is (nearly) a SUBSET of another's —
    quotes, excerpts, and expanded re-publications that symmetric
    Jaccard misses entirely (a paragraph inside a book has Jaccard ≈ 0
    but containment ≈ 1).

    Returns (contained_id, container_id, n_common, size_contained,
    containment_permille) for ordered pairs — integer permille, so the
    threshold is engine-deterministic.  ``min_shingles`` skips trivially
    small shingle sets (two shared trigrams prove nothing).

    Scale shape: identical to ngram_jaccard_pairs — shingle-hash
    equi-join, per-pair partial-agged counts; this is the exact
    verification form (block with LSH upstream at corpus scale).
    ``max_candidates_per_shingle`` bounds the per-shingle join volume
    exactly as in :func:`ngram_jaccard_pairs` (stop-shingle drop,
    reported via a constant ``n_shingles_dropped`` output column;
    containment becomes a lower bound); ``None`` keeps the exact
    semantics and schema.
    """
    sh, dropped = _shingle_rows(
        df, text_col, id_col, n, max_candidates_per_shingle
    )
    a = sh.alias("a")
    b = sh.alias("b")
    out = (
        a.join(
            b,
            on=[
                F.col("a.sh") == F.col("b.sh"),
                F.col(f"a.{id_col}") != F.col(f"b.{id_col}"),
            ],
        )
        # the contained side's true set size rides the grouping key —
        # no post-agg sizes join (see _shingle_rows).  b's set_size is
        # grouped too (functionally dependent, zero extra groups) so
        # both join sides keep the SAME projection and their exchanges
        # canonicalize equal — ReusedExchange then shares one shuffle.
        .groupBy(
            F.col(f"a.{id_col}").alias("contained_id"),
            F.col(f"b.{id_col}").alias("container_id"),
            F.col("a.set_size").alias("size_contained"),
            F.col("b.set_size").alias("_size_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("size_contained") >= min_shingles)
        .select(
            "contained_id",
            "container_id",
            "n_common",
            "size_contained",
            F.expr("1000 * n_common div size_contained").alias(
                "containment_permille"
            ),
        )
        .filter(F.col("containment_permille") >= threshold_permille)
    )
    if dropped is not None:
        out = out.crossJoin(F.broadcast(dropped))
    return out


def cross_source_dup_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source exact-duplicate matrix — the provenance view of
    :func:`exact_dup_groups`: for every UNORDERED source pair (a < b),
    how many distinct contents appear in BOTH.  The governance table
    behind licensing and mixing decisions (a mirror site shows up as a
    near-total row; a syndication feed as a band), and the cheap first
    look before any near-dup machinery.

    Returns (source_a, source_b, n_shared_contents,
    n_shared_doc_pairs) — the second counts doc-level pairs
    (mult_a × mult_b summed over shared contents), bounding the exact
    volume a cross-source dedup would remove.

    Scale shape: one partial-agged shuffle to (content_hash, source,
    count) — duplicates collapse map-side; the pair expansion happens
    on the per-content SOURCE LIST (array combinations over ≤
    |sources| entries), never on doc rows; the final rollup is a
    source-pair-cardinality aggregate."""
    per_src = (
        df.select(
            F.md5(F.col(text_col)).alias("_h"),
            F.col(group_col).alias("_s"),
        )
        .groupBy("_h", "_s")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    lists = per_src.groupBy("_h").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_s"), F.col("_n")))
        ).alias("_sl")
    ).filter(F.size("_sl") > 1)
    # unordered pairs from the per-content source list: flatten the
    # upper triangle via a double transform (array-domain, ≤|sources|²)
    pairs = lists.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(_sl, (x, i) -> "
                    "transform(slice(_sl, i + 2, size(_sl)), "
                    "y -> struct(x._s AS sa, y._s AS sb, "
                    "x._n * y._n AS np)))"
                )
            )
        ).alias("_p")
    )
    return (
        pairs.groupBy(
            F.col("_p.sa").alias("source_a"),
            F.col("_p.sb").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_shared_contents"),
            F.sum("_p.np").alias("n_shared_doc_pairs"),
        )
    )
