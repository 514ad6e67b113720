"""Declarative data-quality constraint checking (dbt-test / expectation
style), computed engine-side in as few passes as the rules allow.

An ETL pipeline's load step is only as trustworthy as its checks; the
reference's only mechanism is row-skipping on parse errors
(``ON_ERROR='CONTINUE'``, BlueForty.py:113) plus four manual row-count
comments.  This operator generalizes that into machine-checkable rules:

- ``not_null`` / ``in_range`` / ``accepted_values`` — conditional
  counts; ALL of them fuse into ONE aggregate over one scan.
- ``unique`` — excess-duplicate count via ``COUNT(*) −
  COUNT(DISTINCT key-tuple)`` in the same aggregate (key tuples are
  structs, so null fields participate as values — identical semantics
  in the DuckDB oracle's ``ROW()`` comparison).
- ``foreign_key`` — referential integrity via LEFT ANTI join against
  the referenced table (broadcast when the reference side is small,
  e.g. dimension tables; AQE handles the big-ref case).

Output: one row per rule — ``(rule, n_violations)`` — cheap enough to
gate a 100 TB load on (the scalar rules add no pass beyond the scan the
load already does).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def constraint_violations(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str]] = (),
    in_range: Mapping[str, tuple[float, float]] | None = None,
    accepted_values: Mapping[str, Sequence[str]] | None = None,
    foreign_keys: Sequence[tuple[Sequence[str], DataFrame, Sequence[str]]] = (),
) -> DataFrame:
    """Evaluate all rules; return ``(rule, n_violations)`` per rule.

    Violation definitions (nulls are the ``not_null`` rule's job, so the
    value rules skip them):

    - ``not_null:c`` — rows where c IS NULL.
    - ``unique:c1,c2`` — COUNT(*) − COUNT(DISTINCT (c1,c2)): the number
      of excess rows beyond one per key tuple.
    - ``in_range:c`` — non-null c outside [lo, hi].
    - ``accepted_values:c`` — non-null c not in the allow-list.
    - ``foreign_key:c→ref`` — rows with all key parts non-null and no
      match in the referenced table.
    """
    # Every SUM-backed rule coalesces to 0: a global SUM over an
    # EMPTY relation (a routinely-empty partition-pruned slice, or an
    # empty WAP staging write) is NULL, and a NULL count would slip
    # through every `n_violations > 0` audit gate silently — zero rows
    # have zero violations, so say 0.
    aggs = []
    for c in not_null:
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"not_null:{c}")
        )
    for cols in unique:
        key = F.struct(*[F.col(c) for c in cols])
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(key))
            .cast("bigint")
            .alias(f"unique:{','.join(cols)}")
        )
    for c, (lo, hi) in (in_range or {}).items():
        v = F.col(c)
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(
                        v.isNotNull() & ((v < lo) | (v > hi)), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"in_range:{c}")
        )
    for c, vals in (accepted_values or {}).items():
        v = F.col(c)
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(
                        v.isNotNull() & ~v.isin(list(vals)), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"accepted_values:{c}")
        )

    parts: list[DataFrame] = []
    if aggs:
        one = df.agg(*aggs)
        stack_args = ", ".join(f"'{a}', `{a}`" for a in one.columns)
        parts.append(
            one.selectExpr(
                f"stack({len(one.columns)}, {stack_args}) AS "
                "(rule, n_violations)"
            )
        )
    for cols, ref, ref_cols in foreign_keys:
        cols, ref_cols = list(cols), list(ref_cols)
        cond = None
        for c, rc in zip(cols, ref_cols):
            clause = df[c] == ref[rc]
            cond = clause if cond is None else (cond & clause)
        nn = None
        for c in cols:
            clause = F.col(c).isNotNull()
            nn = clause if nn is None else (nn & clause)
        name = f"foreign_key:{','.join(cols)}->{','.join(ref_cols)}"
        parts.append(
            df.filter(nn)
            .join(ref.select(*ref_cols), on=cond, how="left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(F.lit(name).alias("rule"), "n_violations")
        )
    if not parts:
        raise ValueError("no constraints given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns — the privacy
    gate a dataset release (or training-corpus export) runs before
    shipping rows that could re-identify people: every combination of
    ``quasi_cols`` values must be shared by at least ``k`` rows, or
    the rows in that equivalence class are individually distinguishable
    by an adversary who knows those attributes (Sweeney 2002).

    Returns one row per VIOLATING equivalence class:
    (quasi_cols..., class_size, deficit) with ``deficit = k −
    class_size`` — the audit trail that drives either suppression
    (drop the class) or generalization (coarsen a column — rerun on
    e.g. a banded version of the column until the audit is empty).
    NULL counts as a value (an all-NULL class of size ≥ k passes).

    Scale shape: ONE partial-aggregated groupBy over the
    quasi-identifier tuple — COUNT(*) GROUP BY cost — and the output
    is only the violating tail, which is the small end of the
    distribution by construction.
    """
    if k < 2:
        raise ValueError("k must be >= 2 for a meaningful audit")
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count(F.lit(1)).alias("class_size"))
        .filter(F.col("class_size") < k)
        .withColumn("deficit", F.lit(int(k)) - F.col("class_size"))
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    ell: int = 2,
) -> DataFrame:
    """l-diversity audit — the companion gate to :func:`k_anonymity`
    (Machanavajjhala et al. 2007): k-anonymity alone fails when an
    equivalence class, however large, carries only ONE sensitive value
    (the homogeneity attack — every member is outed anyway).  Each
    quasi-identifier class must contain at least ``ell`` DISTINCT
    sensitive values.

    Returns one row per VIOLATING equivalence class:
    (quasi_cols..., class_size, n_sensitive, deficit) with ``deficit =
    ell − n_sensitive``.  NULL sensitive values count as one value
    (distinct-with-null semantics match the SQL oracle's
    COUNT(DISTINCT) + a null-presence term).

    Scale shape: ONE groupBy over the quasi tuple with a partial-agged
    COUNT + COUNT DISTINCT — same single-pass cost as k_anonymity;
    output is the violating tail only.
    """
    if ell < 2:
        raise ValueError("ell must be >= 2 for a meaningful audit")
    s = F.col(sensitive_col)
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            (
                F.countDistinct(s)
                + F.max(F.when(s.isNull(), 1).otherwise(0))
            ).alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < ell)
        .withColumn("deficit", F.lit(int(ell)) - F.col("n_sensitive"))
    )


#: Benford first-digit expectation, floor(log10(1+1/d)·1000) —
#: precomputed offline (the nDCG-table pattern: zero in-engine
#: logarithms, both engines consume the same integers).
_BENFORD_PERMILLE = {1: 301, 2: 176, 3: 124, 4: 96, 5: 79, 6: 66,
                     7: 57, 8: 51, 9: 45}


def benford_audit(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Benford's-law first-digit audit — the forensic data-quality
    check for fabricated or truncated numeric feeds: naturally
    occurring amounts follow P(d) = log10(1+1/d), and a feed whose
    leading digits deviate hard (all 5s, uniform digits) was rounded,
    capped, or invented.

    Digit extraction avoids in-engine logarithms AND float formatting:
    the value quantizes to an integer (``floor(value·scale)``,
    positive rows only) and the first digit is the first character of
    the INTEGER's decimal string — engine-stable where double→string
    is not.  Expected shares are precomputed integers.

    Returns one row per digit 1-9: (digit, n, obs_permille,
    exp_permille, dev_permille = obs − exp).

    Scale shape: one map-stage digit projection → 9-group partial agg
    → total via a window over the 9-row digit table (no second scan).
    """
    q = df.filter(F.col(value_col) > 0).select(
        F.floor(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("_q")
    ).filter(F.col("_q") > 0)
    digit = F.substring(F.col("_q").cast("string"), 1, 1).cast("int")
    counts = q.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(F.lit(1))
    exp_map = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PERMILLE.items() for x in kv]
    )
    return (
        counts.withColumn("_total", F.sum("n").over(w))
        .select(
            "digit",
            "n",
            F.expr("n * 1000 DIV _total").alias("obs_permille"),
            exp_map[F.col("digit")].cast("long").alias("exp_permille"),
            (
                F.expr("n * 1000 DIV _total")
                - exp_map[F.col("digit")].cast("long")
            ).alias("dev_permille"),
        )
    )


def k_anonymize(
    df: DataFrame,
    ladder: "Sequence[Sequence[Column]]",
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """k-anonymity GENERALIZATION (the enforcement sibling of the
    :func:`k_anonymity` audit): assign every record the SMALLEST
    generalization level at which its quasi-identifier group reaches
    size >= k — progressive coarsening (full value → bucket → wider
    bucket → suppressed) instead of dropping rows, so the released
    table keeps its row count and loses the minimum information.

    ``ladder`` is a list of levels, each a list of generalized
    quasi-identifier Columns (level 0 = finest).  An implicit final
    level suppresses everything (one global group), so every record
    terminates.  Levels must be PRE-AGREED coarsenings — monotonic by
    construction in the caller's ladder.

    Plan shape: one partial-agged group count per level (the count
    tables are bounded by group cardinality, not rows) joined back
    broadcast; the level choice is a COALESCE over the joined counts
    — no shuffle of the fact table beyond the count aggregations.
    Output: ``id_col``, ``anon_level`` (0-based; len(ladder) =
    suppressed), and the chosen level's generalized columns as
    strings (``g0, g1, ...``; suppressed level renders '*').
    """
    n_q = len(ladder[0])
    if any(len(level) != n_q for level in ladder):
        raise ValueError("all ladder levels need the same column count")

    work = df.select(F.col(id_col), *df.columns)
    lvl_counts = []
    for li, level in enumerate(ladder):
        keyed = df.select(
            F.col(id_col),
            *[
                c.cast("string").alias(f"_l{li}_{j}")
                for j, c in enumerate(level)
            ],
        )
        cols = [f"_l{li}_{j}" for j in range(n_q)]
        counts = keyed.groupBy(*cols).agg(
            F.count("*").alias(f"_n{li}")
        )
        keyed = keyed.join(counts, cols, "left")
        lvl_counts.append(keyed)

    out = lvl_counts[0]
    for li in range(1, len(ladder)):
        out = out.join(lvl_counts[li], id_col)

    level_expr = F.lit(len(ladder))  # implicit suppression level
    for li in reversed(range(len(ladder))):
        level_expr = F.when(
            F.col(f"_n{li}") >= k, F.lit(li)
        ).otherwise(level_expr)
    out = out.withColumn("anon_level", level_expr)

    g_cols = []
    for j in range(n_q):
        expr = F.lit("*")  # suppressed
        for li in reversed(range(len(ladder))):
            expr = F.when(
                F.col("anon_level") == li,
                F.coalesce(F.col(f"_l{li}_{j}"), F.lit("*")),
            ).otherwise(expr)
        g_cols.append(expr.alias(f"g{j}"))
    return out.select(F.col(id_col), F.col("anon_level"), *g_cols)


def t_closeness(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    bin_width: int,
    t_permille: int = 200,
) -> DataFrame:
    """t-closeness audit — the third rung of the anonymization-gate
    ladder after :func:`k_anonymity` and :func:`l_diversity` (Li,
    Li & Venkatasubramanian 2007): a class can be large AND diverse yet
    still leak when its sensitive-value DISTRIBUTION differs sharply
    from the table's (the skewness attack — "this class is 90% high
    earners").  For an ORDERED numeric attribute the distance is the
    Earth Mover's Distance between the class distribution and the
    global one: EMD = Σ|P_cum − Q_cum| / (m − 1) over ``m`` ordered
    value bins of width ``bin_width``.

    Integer-exact: with class size g and table size N, the per-bin term
    |cum_class/g − cum_all/N| becomes |cum_class·N − cum_all·g| over a
    common denominator g·N, so

        emd_permille = 1000·Σ|cum_class·N − cum_all·g| div ((m−1)·g·N)

    — every step integer, both engines agree bit-for-bit.  Returns one
    row per equivalence class: (quasi_cols…, class_size, emd_permille,
    violates = emd_permille > t_permille).

    Scale shape: one groupBy to the (class, bin) histogram (map-side
    combine collapses rows to at most classes×bins), cumulative sums as
    windows PARTITIONED BY class over the bounded bin axis — never a
    window over raw rows — and a broadcast of the m-row global
    histogram.  Output is |classes| rows.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    qcols = [F.col(c) for c in quasi_cols]
    binned = df.select(
        *qcols,
        F.floor(F.col(sensitive_col).cast("double") / bin_width)
        .cast("bigint")
        .alias("_bin"),
    ).filter(F.col("_bin").isNotNull())
    per_class = binned.groupBy(*qcols, F.col("_bin")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    glob = (
        binned.groupBy("_bin")
        .agg(F.count(F.lit(1)).alias("_gc"))
        .withColumn(
            "_gcum",
            F.sum("_gc").over(
                Window.orderBy("_bin").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .withColumn("_n_all", F.sum("_gc").over(Window.partitionBy(F.lit(1))))
        .withColumn(
            "_m", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
        )
        .select("_bin", "_gcum", "_n_all", "_m")
    )
    # every class must be evaluated over ALL m bins (a bin the class
    # never hits still contributes |0·N − cum_all·g|), so the class
    # histogram right-joins the global bin axis per class
    classes = per_class.groupBy(*qcols).agg(
        F.sum("_c").alias("class_size")
    )
    grid = classes.crossJoin(F.broadcast(glob.select("_bin")))
    filled = grid.join(
        per_class, on=[*quasi_cols, "_bin"], how="left"
    ).fillna({"_c": 0})
    cum = filled.withColumn(
        "_ccum",
        F.sum("_c").over(
            Window.partitionBy(*qcols)
            .orderBy("_bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    scored = (
        cum.join(F.broadcast(glob), on="_bin")
        .groupBy(*qcols, "class_size")
        .agg(
            # m = 1 (all values in one bin) means every distribution is
            # identical — EMD 0 by definition, not a division by zero
            F.expr(
                "CASE WHEN max(_m) <= 1 THEN 0 ELSE "
                "1000 * sum(abs(_ccum * _n_all - _gcum * class_size)) "
                "div ((max(_m) - 1) * class_size * max(_n_all)) END"
            ).alias("emd_permille")
        )
    )
    return scored.select(
        *quasi_cols,
        "class_size",
        "emd_permille",
        (F.col("emd_permille") > t_permille).alias("violates"),
    )


def randomized_response(
    df: DataFrame,
    label_col: str,
    group_col: str,
    id_col: str = "doc_id",
    flip_permille: int = 250,
    salt: str = "rr",
) -> DataFrame:
    """Warner's randomized response (1965) — the local-differential-
    privacy mechanism for collecting a sensitive boolean: each record
    reports its TRUE label with probability 1−p and the FLIPPED label
    with probability p, then the aggregate debiases the observed rate
    back to an unbiased estimate ``t̂ = (obs − p) / (1 − 2p)``.  No
    record's reported bit reveals its true bit beyond the p-governed
    plausible deniability (ε = ln((1−p)/p) per-record).

    The "coin" is the salted md5 bucket of the record id — the house
    no-RNG discipline — so the mechanism is reproducible on any engine
    and stable under retry (a re-run leaks nothing new, unlike a fresh
    RNG draw).  All arithmetic is integer permille; the estimate is
    clamped to [0, 1000] BEFORE division sees a negative numerator
    (Spark ``div`` truncates, DuckDB ``//`` floors — clamping keeps
    both on the identical nonnegative path).

    Returns per group: (group, n, obs_pos, obs_permille,
    est_true_permille, true_permille) — the true rate rides along as
    the debiasing audit (in production the true column never leaves
    the client; here it demonstrates estimator consistency).

    Scale shape: one map stage (hash coin + conditional flip) + one
    partial-agged groupBy; nothing else."""
    from .sampling import _bucket

    p = int(flip_permille)
    if not 0 < p < 500:
        raise ValueError("flip_permille must be in (0, 500)")
    coin = _bucket(F.col(id_col), salt) % 1000
    lab = F.col(label_col).cast("boolean")
    reported = F.when(coin < p, ~lab).otherwise(lab)
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(reported.cast("long")).alias("obs_pos"),
        F.sum(lab.cast("long")).alias("true_pos"),
    )
    return agg.select(
        group_col,
        "n",
        "obs_pos",
        F.expr("1000 * obs_pos div n").alias("obs_permille"),
        F.expr(
            f"least(CAST(1000 AS BIGINT),"
            f" greatest(CAST(0 AS BIGINT),"
            f" 1000 * (1000 * obs_pos - {p} * n))"
            f" div ({1000 - 2 * p} * n))"
        ).alias("est_true_permille"),
        F.expr("1000 * true_pos div n").alias("true_permille"),
    )
