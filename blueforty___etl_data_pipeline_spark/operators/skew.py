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
