"""Probabilistic record linkage (Fellegi–Sunter) over blocked pairs.

The classic warehouse-ETL matching problem the reference's pipeline
family sits next to (BlueForty.py loads purchase/invoice feeds that its
reconciliation step must line up): decide which rows of two dirty
sources describe the same real-world entity.  Fellegi–Sunter scores a
candidate pair by summing per-field log-odds weights — a positive
"agreement" weight when the field matches, a negative "disagreement"
weight when it does not — and thresholds the total.

Engine-exact by construction: weights are caller-supplied INTEGERS
(milli-log-odds precomputed offline — the same inline-the-table pattern
as the nDCG discount table), so the score is pure integer arithmetic
with no in-engine logarithms.

Scale shape: candidates come only from an equi-join on the blocking
key (never all-pairs); a degenerate blocking value (one giant block is
the skew risk — m_left × m_right pairs) is dropped up front by
``max_block_size``, mirroring ``minhash_lsh_pairs``'s bucket cap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def record_linkage(
    left: DataFrame,
    right: DataFrame,
    block_cols: Sequence[str],
    compare_weights: Sequence[tuple[str, int, int]],
    left_id_col: str = "left_id",
    right_id_col: str = "right_id",
    threshold_milli: int | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Score blocked candidate pairs by integer Fellegi–Sunter weights.

    ``left`` / ``right`` each carry their id column, the ``block_cols``,
    and every compare column (pre-normalized by the caller — e.g.
    upper-cased names, banded amounts; the comparator here is null-safe
    equality).  ``compare_weights`` rows are
    ``(col, agree_milli, disagree_milli)`` with ``agree_milli > 0 >
    disagree_milli`` in milli-log-odds.  A field that is NULL on either
    side contributes NEITHER weight (standard FS missing-data handling).

    Returns (left_id, right_id, score_milli, agree_mask) — ``agree_mask``
    is a '1'/'0'/'-' character per compare column in order (agree /
    disagree / missing), the audit trail for threshold tuning.  Pairs
    below ``threshold_milli`` (if given) are dropped.

    Scale shape: one hash equi-join on the blocking key; scoring and the
    threshold are map-side column arithmetic on the join output.  With
    ``max_block_size`` set, blocks larger than the cap ON EITHER SIDE
    are removed before the join (a block of m_l × m_r rows contributes
    that many pairs — one boilerplate blocking value can dominate the
    job at corpus scale; capped members can still match under a
    different blocking pass, the standard multi-pass linkage design).
    """
    blocks = list(block_cols)
    if not blocks:
        raise ValueError("record_linkage requires at least one block col")

    def side(df: DataFrame, idc: str, tag: str) -> DataFrame:
        proj = df.select(
            F.col(idc),
            *[F.col(b) for b in blocks],
            *[F.col(c).alias(f"{tag}_{c}") for c, _, _ in compare_weights],
        )
        if max_block_size is not None:
            ok = (
                proj.groupBy(*blocks)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") <= max_block_size)
                .drop("_n")
            )
            proj = proj.join(ok, on=blocks, how="left_semi")
        return proj

    lhs = side(left, left_id_col, "_l")
    rhs = side(right, right_id_col, "_r")
    pairs = lhs.join(rhs, on=blocks)

    score = F.lit(0).cast("long")
    mask_parts = []
    for col, agree, disagree in compare_weights:
        lc, rc = F.col(f"_l_{col}"), F.col(f"_r_{col}")
        missing = lc.isNull() | rc.isNull()
        agreed = lc.eqNullSafe(rc) & ~missing
        score = score + (
            F.when(missing, F.lit(0))
            .when(agreed, F.lit(int(agree)))
            .otherwise(F.lit(int(disagree)))
        )
        mask_parts.append(
            F.when(missing, F.lit("-")).when(agreed, F.lit("1")).otherwise(
                F.lit("0")
            )
        )
    out = pairs.select(
        F.col(left_id_col),
        F.col(right_id_col),
        score.alias("score_milli"),
        F.concat(*mask_parts).alias("agree_mask"),
    )
    if threshold_milli is not None:
        out = out.filter(F.col("score_milli") >= int(threshold_milli))
    return out


def blocking_eval(
    left: DataFrame,
    right: DataFrame,
    block_col: str,
    truth_col: str,
    left_id: str = "lid",
    right_id: str = "rid",
) -> DataFrame:
    """Blocking-quality report — the two numbers every record-linkage
    blocking scheme must publish (Christen 2012): REDUCTION RATIO
    (what fraction of the full cross product the blocks avoided) and
    PAIR COMPLETENESS (what fraction of true matches survive
    blocking).  A scheme scoring high on one and silently low on the
    other is how linkage pipelines lose matches at scale — this makes
    the trade explicit and oracle-checkable.

    ``truth_col`` names a column present on BOTH sides whose equality
    defines a true match (at fixture scale truth is exact; in
    production it is a labeled sample).  Returns one row:
    (n_left, n_right, n_candidates, n_true, n_true_in_blocks,
    reduction_ratio_permille, pair_completeness_permille).

    Scale shape: candidate counts come from per-block COUNT products
    (block-cardinality join, never materializing candidate pairs);
    true-match counts the same way on the truth key — the report costs
    two small aggregates regardless of corpus size."""
    lb = left.groupBy(F.col(block_col).alias("_b")).agg(
        F.count(F.lit(1)).alias("_nl")
    )
    rb = right.groupBy(F.col(block_col).alias("_b")).agg(
        F.count(F.lit(1)).alias("_nr")
    )
    cand = lb.join(rb, on="_b").agg(
        F.coalesce(F.sum(F.col("_nl") * F.col("_nr")), F.lit(0)).alias(
            "n_candidates"
        )
    )
    lt = left.groupBy(F.col(truth_col).alias("_t")).agg(
        F.count(F.lit(1)).alias("_nl")
    )
    rt = right.groupBy(F.col(truth_col).alias("_t")).agg(
        F.count(F.lit(1)).alias("_nr")
    )
    true_all = lt.join(rt, on="_t").agg(
        F.coalesce(F.sum(F.col("_nl") * F.col("_nr")), F.lit(0)).alias(
            "n_true"
        )
    )
    ltb = left.groupBy(
        F.col(block_col).alias("_b"), F.col(truth_col).alias("_t")
    ).agg(F.count(F.lit(1)).alias("_nl"))
    rtb = right.groupBy(
        F.col(block_col).alias("_b"), F.col(truth_col).alias("_t")
    ).agg(F.count(F.lit(1)).alias("_nr"))
    true_in = ltb.join(rtb, on=["_b", "_t"]).agg(
        F.coalesce(F.sum(F.col("_nl") * F.col("_nr")), F.lit(0)).alias(
            "n_true_in_blocks"
        )
    )
    totals = left.agg(F.count(F.lit(1)).alias("n_left")).crossJoin(
        right.agg(F.count(F.lit(1)).alias("n_right"))
    )
    return (
        totals.crossJoin(cand)
        .crossJoin(true_all)
        .crossJoin(true_in)
        .select(
            "n_left",
            "n_right",
            "n_candidates",
            "n_true",
            "n_true_in_blocks",
            F.expr(
                "1000 - 1000 * n_candidates div (n_left * n_right)"
            ).alias("reduction_ratio_permille"),
            F.expr(
                "CASE WHEN n_true = 0 THEN 1000 "
                "ELSE 1000 * n_true_in_blocks div n_true END"
            ).alias("pair_completeness_permille"),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_col: str,
    id_col: str,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    classic second pass of multi-pass record linkage: sort all records
    by a key and emit every pair within ``window`` positions, catching
    near-matches an equality-blocking pass misses (typo'd names land
    adjacent, not equal).  The sliding window bounds candidates at
    n·window, against the n²/|blocks| risk of coarse equality blocks.

    Deterministic total order: (``sort_col`` ASC, ``id_col`` ASC),
    positions from the distributed two-phase rank
    (:func:`~.analytics.exact_global_rank` — no single-partition
    window).  Pair generation is rank arithmetic: each row explodes
    to ``window`` probe positions (rank+1 .. rank+window) and
    equi-joins the rank table — ONE hash join keyed on an integer,
    never a range self-join.

    Returns (id_a, id_b, rank_distance) with id_a at the lower rank;
    ``rank_distance`` in 1..window.  ``sort_col`` must be numeric and
    non-null (the rank chunker probes percentiles); encode string
    keys to a numeric prefix first (e.g. the zip5/banding functions
    in functions/cleaning.py).
    """
    from .analytics import exact_global_rank

    ranked, _n = exact_global_rank(
        df.select(F.col(id_col).alias("_sn_id"), F.col(sort_col).alias("_sn_k")),
        "_sn_k",
        "_sn_id",
        out_col="_sn_r",
    )
    probes = ranked.select(
        F.col("_sn_id").alias("id_a"),
        F.col("_sn_r").alias("_ra"),
        F.explode(
            F.sequence(F.col("_sn_r") + 1, F.col("_sn_r") + window)
        ).alias("_sn_r2"),
    )
    right = ranked.select(
        F.col("_sn_id").alias("id_b"), F.col("_sn_r").alias("_sn_r2")
    )
    return probes.join(right, on="_sn_r2").select(
        "id_a",
        "id_b",
        (F.col("_sn_r2") - F.col("_ra")).cast("int").alias("rank_distance"),
    )


def fellegi_sunter_weights(
    pairs: DataFrame,
    label_col: str,
    field_cols: Sequence[str],
    alpha: float = 0.5,
) -> DataFrame:
    """Estimate Fellegi-Sunter field weights from LABELED candidate
    pairs — the training step whose output ``record_linkage`` scores
    with: given per-pair boolean field agreements and a match label,

        m_f = P(agree_f | match)      (Laplace alpha)
        u_f = P(agree_f | non-match)
        w_agree_f    = ln(m_f / u_f)
        w_disagree_f = ln((1 - m_f) / (1 - u_f))

    Output: one row per field — (field, n_match, n_unmatch,
    agree_match, agree_unmatch, w_agree_e6, w_disagree_e6), the
    fixed-point log-odds a scorer adds per agreeing/disagreeing
    field.  Counts are exact longs; the two weights are e6 floors of
    one double expression each, mirrored by the oracle.

    Scale shape: ONE partial-agged aggregation computes every
    conditional count (2 + 2·|fields| sums over the pair table);
    the per-field rows then unpivot from the single 1-row frame —
    pair rows are touched exactly once, and nothing downstream is
    larger than |fields|.
    """
    lab = F.col(label_col).cast("boolean")
    aggs = [
        F.sum(F.when(lab, 1).otherwise(0)).alias("n_m"),
        F.sum(F.when(lab, 0).otherwise(1)).alias("n_u"),
    ]
    for f in field_cols:
        ag = F.col(f).cast("boolean")
        aggs.append(
            F.sum(F.when(lab & ag, 1).otherwise(0)).alias(f"am_{f}")
        )
        aggs.append(
            F.sum(F.when((~lab) & ag, 1).otherwise(0)).alias(f"au_{f}")
        )
    one = pairs.agg(*aggs)

    # Unpivot the 1-row aggregate with ONE inline() of a struct array;
    # a union of per-field selects would re-plan the full-table
    # aggregation once per field (ADVICE r11 — the fd_check fix).
    def _field_struct(f: str):
        m = (F.col(f"am_{f}") + alpha) / (F.col("n_m") + 2 * alpha)
        u = (F.col(f"au_{f}") + alpha) / (F.col("n_u") + 2 * alpha)
        return F.struct(
            F.lit(f).alias("field"),
            F.col("n_m").cast("long").alias("n_match"),
            F.col("n_u").cast("long").alias("n_unmatch"),
            F.col(f"am_{f}").cast("long").alias("agree_match"),
            F.col(f"au_{f}").cast("long").alias("agree_unmatch"),
            F.floor(F.lit(1000000.0) * F.log(m / u))
            .cast("long")
            .alias("w_agree_e6"),
            F.floor(
                F.lit(1000000.0)
                * F.log((F.lit(1.0) - m) / (F.lit(1.0) - u))
            )
            .cast("long")
            .alias("w_disagree_e6"),
        )

    return one.select(
        F.inline(F.array(*[_field_struct(f) for f in field_cols]))
    )
