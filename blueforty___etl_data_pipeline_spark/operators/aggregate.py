"""Aggregation operators (SURVEY.md §2.4).

Spark's hash aggregate does the partial/final (map-side combine) split
automatically — every groupBy here ships only one partially-aggregated
row per (partition, key) into the shuffle, which is what makes these
viable at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_sum_round(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    alias: str,
    scale: int = 2,
) -> DataFrame:
    """PURCHASE_ORDER_TOTALS shape (BlueForty.py:119-126):
    ``ROUND(SUM(value), scale)`` grouped by ``keys``.

    ``value`` should already encode the reference's
    ``COALESCE(x,0)*COALESCE(y,0)`` input expression where needed.
    Note: Snowflake ROUND is half-away-from-zero, Spark's is HALF_UP —
    identical for the non-negative money here (SURVEY.md F9).
    """
    return df.groupBy(*keys).agg(F.round(F.sum(value), scale).alias(alias))


def preagg_join(
    fact: DataFrame,
    agg_keys: Sequence[str],
    agg_exprs: Sequence[Column],
    other: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """CTE-style pre-aggregate-then-join (BlueForty.py:207-215, :222-231).

    Aggregating the fact side BEFORE the join is load-bearing for scale:
    the shuffle carries one row per key instead of every fact row, and
    Catalyst will not push an aggregate through a join on its own
    (SURVEY.md §4).  ``on`` uses Spark's named-column join, which gives
    SQL USING semantics — the key appears once in the output.
    """
    aggregated = fact.groupBy(*agg_keys).agg(*agg_exprs)
    return aggregated.join(other, on=on, how=how)


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: int = 20,
    scale: int = 100,
    leave_one_out: bool = False,
) -> DataFrame:
    """Target encoding of a categorical column — replace each
    category with the (smoothed) mean of a numeric target, the
    workhorse categorical feature for tabular models at cardinalities
    where one-hot explodes.

    Two leakage regimes:

    - smoothed (default): enc(c) = (sum_c + m * global_mean) /
      (cnt_c + m) — the m-sample prior shrinks rare categories
      toward the global mean instead of memorizing them;
    - ``leave_one_out``: each ROW's own target is excluded,
      enc = (sum_c - y_row) / (cnt_c - 1) (falling back to the
      global mean for singletons) — the train-time variant that
      keeps the row's label out of its own feature.

    Exactness: targets quantize to exact integers (``scale``); both
    encodings are single divisions of exact integers, floored to e6
    — engine-portable like every fixed-point op here.  Plan: one
    partial-agged category aggregation + a broadcast-able join back
    (category cardinality bounds the join side); LOO adds no extra
    shuffle — it reuses the same joined sums row-wise.

    Output: df's ``cat_col`` + row id columns are NOT carried;
    returns (cat value, n_c, enc_e6) in grouped mode, or per-row
    (cat, y, enc_e6) in LOO mode.
    """
    y = F.floor(F.col(target_col).cast("double") * scale).cast("long")
    base = df.select(F.col(cat_col).alias("c"), y.alias("y"))
    per_cat = base.groupBy("c").agg(
        F.sum("y").alias("s_c"), F.count("*").alias("n_c")
    )
    glob = base.agg(
        F.sum("y").alias("s"), F.count("*").alias("n")
    )
    e6 = 1000000.0 / scale
    if not leave_one_out:
        j = per_cat.crossJoin(F.broadcast(glob))
        # (s_c + m * s / n) / (n_c + m), all exact until the division
        num = (
            F.col("s_c").cast("double")
            + F.lit(float(smoothing))
            * F.col("s").cast("double")
            / F.col("n").cast("double")
        )
        den = (F.col("n_c") + smoothing).cast("double")
        return j.select(
            F.col("c").alias(cat_col),
            F.col("n_c").cast("long").alias("n_c"),
            F.floor(F.lit(e6) * num / den).cast("long").alias("enc_e6"),
        )
    j = base.join(F.broadcast(per_cat), "c").crossJoin(
        F.broadcast(glob)
    )
    loo = F.when(
        F.col("n_c") > 1,
        (F.col("s_c") - F.col("y")).cast("double")
        / (F.col("n_c") - 1).cast("double"),
    ).otherwise(
        F.col("s").cast("double") / F.col("n").cast("double")
    )
    return j.select(
        F.col("c").alias(cat_col),
        F.col("y").alias("y_scaled"),
        F.floor(F.lit(e6) * loo).cast("long").alias("enc_e6"),
    )


def woe_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence encoding of a categorical column against a
    BINARY label — the credit-scoring standard (Siddiqi-style
    scorecards) and the usual monotone alternative to target
    encoding when the downstream model wants log-odds units.

    Per category c with smoothing ``alpha`` (Laplace, K = number of
    categories so the smoothed shares still sum to 1):

        p_pos = (pos_c + alpha) / (pos_tot + alpha * K)
        p_neg = (neg_c + alpha) / (neg_tot + alpha * K)
        woe   = ln(p_pos / p_neg)
        iv_c  = (p_pos - p_neg) * woe     # information-value term

    ``label_col`` must be boolean (or 0/1).  Output: (cat, n_pos,
    n_neg, woe_e6, iv_e9) — both floats floored at e6/e9 so the
    result is engine-portable fixed-point like every scaled op here;
    summing iv_e9 gives the predictor's total information value.

    Plan shape: ONE partial-agged conditional-count aggregation over
    the corpus, a category-cardinality-bounded rollup for the totals
    (including K via COUNT over the per-category table), and a
    broadcast cross join back onto the K-row table — raw rows are
    touched exactly once and never joined.
    """
    lab = F.col(label_col).cast("boolean")
    per_cat = (
        df.select(F.col(cat_col).alias("c"), lab.alias("y"))
        .groupBy("c")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("pos_c"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("neg_c"),
        )
    )
    glob = per_cat.agg(
        F.sum("pos_c").alias("pos_t"),
        F.sum("neg_c").alias("neg_t"),
        F.count(F.lit(1)).alias("k"),
    )
    j = per_cat.crossJoin(F.broadcast(glob))
    p_pos = (F.col("pos_c") + alpha) / (
        F.col("pos_t") + F.lit(alpha) * F.col("k")
    )
    p_neg = (F.col("neg_c") + alpha) / (
        F.col("neg_t") + F.lit(alpha) * F.col("k")
    )
    woe = F.log(p_pos / p_neg)
    return j.select(
        F.col("c").alias(cat_col),
        F.col("pos_c").cast("long").alias("n_pos"),
        F.col("neg_c").cast("long").alias("n_neg"),
        F.floor(F.lit(1000000.0) * woe).cast("long").alias("woe_e6"),
        F.floor(F.lit(1000000000.0) * ((p_pos - p_neg) * woe))
        .cast("long")
        .alias("iv_e9"),
    )


def golden_record(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Survivorship merge (the MDM "golden record"): one row per
    entity where EACH attribute independently takes its MOST RECENT
    NON-NULL observation — the standard rule when records arrive
    sparse from many systems and the freshest known value per field
    wins (a plain "latest row wins" would null out fields the latest
    record did not carry).

    ``order_col`` must be a TOTAL order per entity (compose
    ts·K + tiebreak upstream); per attribute the survivor is
    ``max_by(attr, order WHERE attr IS NOT NULL)`` — one hash
    aggregation, map-side combined, no window and no self-join.
    Observation counts per attribute ride along for lineage audits.

    Output: (entity, n_records, then per attribute: <a> and
    <a>_n_obs).
    """
    aggs = [F.count(F.lit(1)).alias("n_records")]
    for a in attr_cols:
        key = F.when(
            F.col(a).isNotNull(), F.col(order_col)
        )
        aggs.append(F.max_by(F.col(a), key).alias(a))
        aggs.append(
            F.sum(
                F.when(F.col(a).isNotNull(), 1).otherwise(0)
            ).alias(f"{a}_n_obs")
        )
    return df.groupBy(F.col(entity_col).alias("entity")).agg(*aggs)


def grouped_mode(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Deterministic per-group mode: the MOST FREQUENT value of
    ``value_col`` within each key, ties broken by the SMALLEST value —
    the categorical summary statistic (dominant label per user,
    majority vote per cluster) that Spark's native ``mode()`` leaves
    tie-nondeterministic and therefore engine-unreplayable.

    Output: (key, mode_value, mode_count).  Plan: ONE partial-agged
    (key, value) count — shuffle volume is the distinct pair
    cardinality, never raw rows — then a WindowGroupLimit top-1 per
    key (count DESC, value ASC), the argmin/top-k discipline used
    throughout.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.col(key_col).alias("k"), F.col(value_col).alias("v"))
        .groupBy("k", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("k").orderBy(F.desc("c"), F.asc("v"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("k").alias(key_col),
            F.col("v").alias("mode_value"),
            F.col("c").cast("long").alias("mode_count"),
        )
    )
