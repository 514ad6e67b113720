"""Market-basket analysis: frequent item pairs with support,
confidence, and lift over transaction baskets.

The warehouse co-occurrence workload (which parts ship together?) —
the first ascent of Apriori/FP-growth, which at pair level needs no
candidate pruning machinery at all: distinct items per basket,
within-basket pair generation, and three aggregate joins.  All output
metrics are integer permille (floor), so results hash identically on
any engine — no floating ratios.

Scale shape: pair volume is Σ_b k_b² /2 over per-basket distinct item
counts — bounded by the basket-size cap, never corpus-pairs (the same
bound argument as ``collocations``, which is this operator's text-
domain sibling).  One groupBy(basket) to build item sets, one Generate
for pairs, partial-agged pair counts, then two broadcast joins against
the tiny single-item count table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_support_permille: int = 1,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Frequent item pairs with integer-permille association metrics.

    Returns one row per unordered pair (item_a < item_b):

    - ``pair_count`` — baskets containing both items
    - ``support_permille`` — floor(1000 · pair_count / n_baskets)
    - ``conf_a_to_b_permille`` — floor(1000 · pair_count / count_a)
      (and the b→a twin): the rule confidence in both directions
    - ``lift_permille`` — floor(1000 · pair_count · n_baskets /
      (count_a · count_b)): >1000 means co-occurrence above
      independence

    Pairs below ``min_support_permille`` are dropped AFTER counting
    (the count shuffle already carries only baskets' internal pairs).
    ``max_basket_size`` drops degenerate baskets (a single basket of
    m items contributes m²/2 pairs — one "everything" basket can
    dominate the job at scale; the cap is the bucket-size cap of the
    LSH family applied to baskets).

    Scale shape: groupBy(basket) collect_set (partial-agged), pair
    Generate bounded by the cap, partial-agged pair counts; the
    single-item count table and the 1-row basket total broadcast onto
    the result — the corpus is scanned once.
    """
    b = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).filter(F.col("_i").isNotNull())
    baskets = b.groupBy("_b").agg(
        F.array_sort(F.collect_set("_i")).alias("_items")
    )
    if max_basket_size is not None:
        baskets = baskets.filter(F.size("_items") <= max_basket_size)
    # No persist: the three consumers (basket total, item counts, pair
    # Generate) all hang off the IDENTICAL groupBy(basket) aggregate,
    # so Spark's ReusedExchange shares one shuffle among them — a
    # cache here would outlive the returned lazy plan and accumulate
    # blocks across calls in a long-lived session (r5 advisor finding).

    n_baskets = baskets.select(
        F.count(F.lit(1)).alias("_n")
    )
    item_counts = baskets.select(
        F.explode("_items").alias("_i")
    ).groupBy("_i").agg(F.count(F.lit(1)).alias("_c"))

    # within-basket unordered pairs: posexplode × element slice — a
    # Generate whose volume is k²/2 per basket, cap-bounded
    pairs = (
        baskets.select(
            F.posexplode("_items").alias("_pos", "item_a"), "_items"
        )
        .select(
            "item_a",
            F.explode(
                F.slice(
                    "_items", F.col("_pos") + 2, F.size("_items")
                )
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    out = (
        pairs.crossJoin(F.broadcast(n_baskets))
        .join(
            F.broadcast(
                item_counts.select(
                    F.col("_i").alias("item_a"), F.col("_c").alias("_ca")
                )
            ),
            on="item_a",
        )
        .join(
            F.broadcast(
                item_counts.select(
                    F.col("_i").alias("item_b"), F.col("_c").alias("_cb")
                )
            ),
            on="item_b",
        )
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.expr("pair_count * 1000 DIV _n").alias("support_permille"),
            F.expr("pair_count * 1000 DIV _ca").alias(
                "conf_a_to_b_permille"
            ),
            F.expr("pair_count * 1000 DIV _cb").alias(
                "conf_b_to_a_permille"
            ),
            F.expr(
                "CAST(pair_count AS DECIMAL(38,0)) * _n * 1000"
                " DIV (CAST(_ca AS DECIMAL(38,0)) * _cb)"
            )
            .cast("long")
            .alias("lift_permille"),
        )
        .filter(
            F.col("support_permille") >= F.lit(int(min_support_permille))
        )
    )
    return out
