"""Skew mitigation for joins (scale toolbox).

AQE's skew-join split (enabled in session.py) handles moderate skew at
runtime by splitting oversized shuffle partitions.  It cannot help when
ONE key value dominates (power-law keys: a handful of customers with
billions of rows) — every row of that key still lands in one task's
hash bucket.  ``salted_join`` is the classic fix:

- fact side: append a random salt in [0, salt) to the join key,
- dim side: explode each row into ``salt`` copies, one per salt value,
- join on (key, salt): the hot key's rows now spread over ``salt``
  tasks; the dim side grows ``salt``× (fine — it's the small side).

Results are exactly a plain inner equi-join (verified by test).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Inner/left equi-join with the fact side salted ``salt`` ways.

    Use when a join key's value distribution is power-law and the hot
    key overwhelms one reducer.  ``rand()`` salting is fine because the
    salt never affects the RESULT, only the partitioning — every fact
    row still meets its dim row (which exists for all salt values).
    """
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = fact.withColumn(
        SALT_COL, (F.rand(seed=42) * salt).cast("int")
    )
    salted_dim = dim.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    return salted_fact.join(salted_dim, on=[*keys, SALT_COL], how=how).drop(
        SALT_COL
    )


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Skew diagnostic: row count of the ``top`` heaviest key values —
    run before choosing between a plain join, AQE, and salting."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"))
        .limit(top)
    )


def skew_report(
    df: DataFrame,
    key: str,
    top: int = 20,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Actionable skew report for a prospective join/agg key: the
    ``top`` heaviest values with their integer-permille share of the
    table and the salt factor that would bring each hot key back under
    ``target_rows_per_task`` rows per reducer
    (``suggested_salt = ceil(n_rows / target)``, 1 = no salting
    needed).  Feed the max suggested_salt straight into
    :func:`salted_join`.

    Scale shape: one partial-agged count per key + a 1-row grand-total
    aggregate broadcast back; the top-k is a TakeOrdered, never a full
    sort.  All outputs integer (permille / ceil-div) — engine-exact.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    # Grand total straight off the input (zero columns read — a
    # metadata-cheap count for columnar sources) instead of re-running
    # the per-key aggregation: Spark does not share the counts subplan
    # between the two branches.
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col(key),
            F.col("n_rows"),
            F.expr("1000 * n_rows div _total").alias("share_permille"),
            # ceil(n/d) for positive n as (n + d − 1) div d — `div`
            # truncates toward zero, so the -((-n) div d) idiom is NOT
            # a ceiling here
            F.expr(
                f"CAST((n_rows + {target_rows_per_task - 1})"
                f" div {target_rows_per_task} AS BIGINT)"
            ).alias("suggested_salt"),
        )
        .orderBy(F.desc("n_rows"), F.asc(key))
        .limit(top)
    )
