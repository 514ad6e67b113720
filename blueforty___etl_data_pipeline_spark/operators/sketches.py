"""Mergeable summary sketches: Count-Min frequency estimation and
KMV (k-minimum-values) distinct-count estimation.

At 100 TB, exact per-key frequency tables and exact COUNT(DISTINCT)
are themselves big-data problems; the standard answer (Cormode &
Muthukrishnan 2005 for Count-Min, Bar-Yossef et al. 2002 for KMV) is
a FIXED-SIZE sketch that (a) is built with one map-side-combinable
aggregation pass, (b) merges associatively across partitions / days /
sources, and (c) answers point queries with bounded one-sided error.
Both sketches here are pure DataFrame aggregations — the sketch IS a
tiny DataFrame, so "merge" is just union + re-aggregate and the whole
path stays inside whole-stage codegen.

Determinism contract: all hashing routes through md5 hex (available
bit-identically on every engine) rather than engine-private hash64
functions, and every estimate is integer arithmetic — which is what
makes these sketches ORACLE-CHECKABLE cross-engine: DuckDB replays
the identical bucket/threshold math and must produce the identical
sketch and estimates (the same md5-portability trick as the
minhash/simhash expression twins in ``operators/dedup.py``).

Reference parity: the BlueForty script profiles load volumes with
exact GROUP BY counts (``BlueForty.py:449,:464`` row-count audit
checkpoints); these sketches are the bounded-memory generalization of
that audit for cardinalities where exact tables no longer fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 48 bits of the md5 hex: small enough that the KMV numerator
# (k-1) * HASH_SPACE stays exactly representable in a signed 64-bit
# long for any practical k (k <= 2^14), so every estimate is EXACT
# integer floor division on both engines — no decimal rounding-mode
# parity traps.  The cost is hash collisions at ~n/2^48 relative
# error, far below KMV's own 1/sqrt(k) sampling error even at 10^9
# distinct keys.
_HASH_HEX_DIGITS = 12
HASH_SPACE = 1 << (4 * _HASH_HEX_DIGITS)


def _md5_long(col, seed=None):
    """First 48 bits of md5(seed ':' value) as a non-negative long —
    the engine-portable hash shared by sketch build and probe.  The
    seed may be a Python int or a Column (for seed-exploded plans)."""
    s = col.cast("string")
    if seed is not None:
        pre = (
            F.lit(f"{seed}:")
            if isinstance(seed, int)
            else F.concat(seed.cast("string"), F.lit(":"))
        )
        s = F.concat(pre, s)
    return F.conv(
        F.substring(F.md5(s), 1, _HASH_HEX_DIGITS), 16, 10
    ).cast("long")


def _slice_long(h_name: str = "_h", seed_name: str = "seed"):
    """Hash row ``seed``'s value: the disjoint 16-bit slice of the
    md5 hex at character offset 4*seed (depth <= 8 fits the 32 hex
    chars).  One digest per row serves every hash row — the same
    one-digest-many-draws scheme as ``profile.permutation_test``."""
    return F.conv(
        F.expr(
            f"substring({h_name}, cast({seed_name} as int) * 4 + 1, 4)"
        ),
        16,
        10,
    ).cast("long")


def count_min_build(
    df: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch: ``depth`` md5-seeded hash rows of
    ``width`` buckets; cell (seed, bucket) holds the summed weight of
    keys landing there.

    One shuffle of at most ``depth * width`` groups (partial-agged
    map-side), independent of input cardinality — the sketch for a
    100 TB table is the same few KB as for a 100 MB one.  Returns
    (seed, bucket, cnt) with every cell present implicitly >= its
    true mass (Count-Min never underestimates).
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    # One scan AND one digest per row: the key hashes once (md5);
    # hash row s reads the disjoint 16-bit slice at hex offset 4s —
    # the same one-digest-many-draws scheme as permutation_test, 4x
    # cheaper than seed-prefixed re-hashing and identically portable.
    fanned = df.select(
        F.md5(F.col(key_col).cast("string")).alias("_h"),
        w.alias("w"),
        F.explode(
            F.array(*[F.lit(s) for s in range(depth)])
        ).alias("seed"),
    )
    return (
        fanned.select(
            "seed",
            (_slice_long() % width).alias("bucket"),
            "w",
        )
        .groupBy("seed", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch: estimate(key) = min over seeds of the
    key's bucket count (0 when a bucket row is absent).

    The probe side fans out ``depth`` rows per key and equi-joins the
    tiny sketch (broadcast — it is at most depth*width rows), so the
    cost is proportional to the probe set, never the sketched corpus.
    Output: (key, est) with est >= true count, the one-sided CM bound.
    """
    fan = probes.select(
        key_col, F.md5(F.col(key_col).cast("string")).alias("_h")
    ).distinct().crossJoin(
        F.broadcast(
            probes.sparkSession.range(depth).select(
                F.col("id").cast("int").alias("seed")
            )
        )
    )
    fan = fan.withColumn("bucket", _slice_long() % width)
    joined = fan.join(
        F.broadcast(sketch), ["seed", "bucket"], "left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return joined.groupBy(key_col).agg(
        F.min("cnt").alias("est")
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """KMV distinct-count estimate, optionally per group.

    Hash every key into [0, 2^48); keep the k smallest DISTINCT
    hashes; if the k-th smallest is h_k, the estimator is
    ``(k-1) * 2^48 // h_k`` (the k-th order statistic of k uniform
    draws estimates k / (n+1) of the space).  Groups with fewer than
    k distinct keys report their exact count (the sketch IS the full
    distinct set there).

    Scale shape: one distinct-hash aggregation (map-side combined),
    then a per-group top-k — a bounded WindowGroupLimit, never a full
    sort.  The sketch state per group is k longs, mergeable by
    min-union, so daily sketches roll up to monthly ones without
    touching raw data.  Output: (group..., n_kept, kth_min,
    est_distinct), integer-exact.
    """
    from pyspark.sql import Window

    gcols = group_cols or []
    hashed = df.select(
        *gcols, _md5_long(F.col(key_col)).alias("h")
    ).distinct()
    win = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy("h")
    topk = hashed.withColumn(
        "rn", F.row_number().over(win)
    ).filter(F.col("rn") <= k)
    agg = topk.groupBy(*gcols).agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("kth_min"),
    )
    return agg.select(
        *gcols,
        "n_kept",
        "kth_min",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.expr(f"CAST({(k - 1) * HASH_SPACE} AS BIGINT) div kth_min")
        )
        .cast("long")
        .alias("est_distinct"),
    )


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter runtime pruning — the engine-level trick behind
    Spark's own runtime row-group filters, surfaced as an operator so a
    pipeline can pre-prune a 100 TB fact scan against a selective dim
    BEFORE the real join: build ``n_hashes`` bit positions per dim key
    (salted md5, mod ``n_bits``), and keep a fact row only when ALL its
    positions are set.  No false negatives ever (every true match
    survives); false positives are bounded by the classic
    (1−e^{−kn/m})^k and get audited explicitly here.

    Returns the audit row — (n_fact, n_kept, n_true, n_false_positive)
    — comparing the Bloom-kept set with the exact distinct-key
    semi-join, because a pruning operator whose FP rate is not measured
    is a silent data-quality risk.  All hashing is the portable
    md5_hash64 chain, so any engine (and the DuckDB oracle) re-derives
    identical bits.

    The keep/drop decision is a function of the KEY, so the audit runs
    over the distinct fact-key domain (n_fact_keys, n_kept_keys,
    n_true_keys, n_false_positive) — in production the same bit set is
    applied as a map-stage row filter on the raw fact scan (zero
    shuffle); here the key-domain distinct makes the FP count
    well-defined instead of conflating key FPs with row multiplicity.

    Scale shape: the bit-position table is at most ``n_bits`` rows
    REGARDLESS of dim size (distinct-collapsed before broadcast); the
    set membership test is an array check against the broadcast bit
    set — a map-stage expression, the exact shape a runtime filter
    compiles to."""
    from ..functions.text import md5_hash64

    def positions(col: Column) -> Column:
        return F.array(
            *[
                F.pmod(
                    md5_hash64(
                        F.concat(
                            F.lit(f"bloom{i}:"), col.cast("string")
                        )
                    ),
                    F.lit(n_bits),
                )
                for i in range(n_hashes)
            ]
        )

    dim = dim_keys.select(F.col(key_col).alias("_k")).distinct()
    bits = (
        dim.select(F.explode(positions(F.col("_k"))).alias("_bit"))
        .distinct()
    )
    # three consumers (probes, kept anti-join, exact-truth semi-join):
    # cut the lineage after the distinct so the fact table is scanned
    # once, not once per audit leg (.explain showed four fact scans)
    fkeys = (
        fact.select(F.col(key_col).alias("_fk"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    probes = fkeys.select(
        "_fk", F.explode(positions(F.col("_fk"))).alias("_bit")
    )
    # a key survives iff EVERY one of its n_hashes positions is set:
    # count distinct matched positions (duplicate positions for one key
    # can only arise from hash collisions within the key, where the
    # distinct count still equals the distinct-position requirement)
    misses = probes.join(F.broadcast(bits), on="_bit", how="left_anti")
    kept = fkeys.join(
        misses.select("_fk").distinct(), on="_fk", how="left_anti"
    )
    truth = fkeys.join(
        F.broadcast(dim), F.col("_fk") == F.col("_k"), "left_semi"
    )
    return (
        fkeys.agg(F.count(F.lit(1)).alias("n_fact_keys"))
        .crossJoin(kept.agg(F.count(F.lit(1)).alias("n_kept_keys")))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_true_keys")))
        .select(
            "n_fact_keys",
            "n_kept_keys",
            "n_true_keys",
            (F.col("n_kept_keys") - F.col("n_true_keys")).alias(
                "n_false_positive"
            ),
        )
    )


def kmv_overlap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise set-overlap estimation between groups from MERGED KMV
    sketches (Beyer et al. 2007): each group keeps its k smallest
    distinct key hashes; for a pair, the union sketch is the k
    smallest of the merged arrays, and the Jaccard estimate is the
    fraction of those union samples present in BOTH sketches.  The
    pairwise-overlap workhorse when the exact intersection
    (dedup.cross_source_dup_matrix) is too expensive — sketches are
    tiny, mergeable, and built in ONE corpus pass for ALL pairs.

    Returns (group_a, group_b, jaccard_permille_est, union_est,
    intersection_est) per unordered pair — all integer (the same
    (k−1)·2^48 // h_k estimator as :func:`kmv_distinct` on the union
    sketch; sub-k unions report their exact size).

    Scale shape: one partial-agged distinct-hash pass → per-group
    k-array (|groups| rows total); the pairwise stage is an
    array-domain broadcast self-join over |groups|² sketch pairs —
    corpus size never enters it."""
    from pyspark.sql import Window

    hashed = df.select(
        F.col(group_col).alias("_g"),
        _md5_long(F.col(key_col)).alias("_h"),
    ).distinct()
    win = Window.partitionBy("_g").orderBy("_h")
    sk = (
        hashed.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .groupBy("_g")
        .agg(F.array_sort(F.collect_list("_h")).alias("_sk"))
    )
    a = sk.select(F.col("_g").alias("group_a"), F.col("_sk").alias("_ska"))
    b = sk.select(F.col("_g").alias("group_b"), F.col("_sk").alias("_skb"))
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    facts = pairs.select(
        "group_a",
        "group_b",
        F.slice(
            F.array_sort(F.array_union("_ska", "_skb")), 1, k
        ).alias("_uk"),
        "_ska",
        "_skb",
    ).select(
        "group_a",
        "group_b",
        F.size("_uk").alias("_nu"),
        F.element_at(F.col("_uk"), F.size("_uk")).alias("_kth"),
        F.size(
            F.array_intersect(
                F.array_intersect("_uk", "_ska"), F.col("_skb")
            )
        ).alias("_both"),
    )
    return facts.select(
        "group_a",
        "group_b",
        F.expr("1000 * _both div _nu").alias("jaccard_permille_est"),
        F.when(F.col("_nu") < k, F.col("_nu").cast("long"))
        .otherwise(
            F.expr(f"CAST({(k - 1) * HASH_SPACE} AS BIGINT) div _kth")
        )
        .alias("union_est"),
    ).select(
        "group_a",
        "group_b",
        "jaccard_permille_est",
        "union_est",
        F.expr("jaccard_permille_est * union_est div 1000").alias(
            "intersection_est"
        ),
    )
