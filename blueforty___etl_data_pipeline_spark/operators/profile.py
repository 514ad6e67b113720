"""Data-profiling and distribution-statistics operators.

A 100 TB training-data pipeline spends real time *characterising* its
inputs before transforming them — value histograms, per-column null /
cardinality profiles, exact quantiles for split points.  These are the
Spark-first shapes for each:

- ``histogram_fixed_width``: one hash aggregation on a computed bin key
  (map-side combine does almost all the work; output is O(n_bins)).
- ``grouped_median_exact``: exact median WITHOUT sorting the data —
  aggregate to (group, value) counts first (one shuffle with partial
  aggregation), then a window over the *distinct values* of each group,
  which is bounded by value cardinality, not row count.  This is the
  scalable exact path; ``percentile_approx`` is the sketch alternative
  when values are continuous.
- ``profile_table``: one pass over the table computing per-column
  null counts, exact distinct counts, and min/max, reshaped to one row
  per column with ``stack`` (no driver-side collect).  At 100 TB swap
  ``countDistinct`` for ``approx_count_distinct`` — the plan shape is
  identical.

Cross-engine determinism (DuckDB oracle): bin edges use power-of-two
widths (exact IEEE division), money math goes through DECIMAL and
integer cents, doubles are never CAST straight to strings.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

_DEC = DecimalType(18, 4)


def histogram_fixed_width(
    df: DataFrame,
    value_col: str,
    width: float = 8.0,
    sum_micros: bool = True,
) -> DataFrame:
    """Fixed-width histogram of a double column.

    Returns (bin, bin_lo, n, [sum_micros]) — one row per occupied bin.

    ``width`` should be a power of two so ``value / width`` is an exact
    IEEE operation and both engines compute identical bin ids for every
    representable double.  ``sum_micros`` adds the order-free exact sum
    ``SUM(FLOOR(value * 1e6))`` (bigint — deterministic regardless of
    partitioning, unlike a double sum).

    Scale: single hash aggregate; partial (map-side) combine reduces
    each task's output to ≤ n_bins rows before the shuffle, so the
    exchange moves O(tasks × bins) rows no matter how big the input is.
    """
    binned = df.select(
        F.floor(F.col(value_col) / F.lit(width)).alias("bin"),
        F.col(value_col).alias("_v"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if sum_micros:
        aggs.append(
            F.sum(F.floor(F.col("_v") * F.lit(1e6)).cast("long")).alias(
                "sum_micros"
            )
        )
    out = binned.groupBy("bin").agg(*aggs)
    keep = ["n", "sum_micros"] if sum_micros else ["n"]
    return out.withColumn(
        "bin_lo", (F.col("bin") * F.lit(width)).cast("double")
    ).select("bin", "bin_lo", *keep)


def grouped_median_exact(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    alias: str = "median",
) -> DataFrame:
    """Exact per-group median of a ≤2-decimal numeric column, computed
    scalably: the window runs over DISTINCT VALUES per group, never over
    raw rows.

    Plan: groupBy(group, value) count  →  cumulative count over values
    within each group  →  pick the value(s) covering the middle
    position(s).  The shuffle carries (group, value) pairs with map-side
    partial counts; the per-group window input is bounded by the value
    domain (at 2 decimals, ≤ ~100 rows per unit of range), so no
    single-partition row explosion even when one group holds 10^12 rows.

    Output: group cols + n_rows + ``alias`` (double).  Median arithmetic
    is integer cents end-to-end — ``(lo + hi) * 5 / 1000.0`` — so both
    engines agree bit-for-bit (bigint→double is exact below 2^53 and the
    final division is a single IEEE op).
    """
    gcols = list(group_cols)
    # Cents quantization rule (shared with mad_outliers and the DuckDB
    # oracles): DECIMAL(18,4) cast, ×100, then TRUNCATE toward zero.
    # Spark's decimal→long cast truncates; the oracles spell it
    # trunc(...) explicitly so >2-decimal inputs quantize identically
    # on both engines by construction.
    cents = F.col(value_col).cast(_DEC) * 100
    out = _median2_int(
        df.select(*gcols, cents.cast("long").alias("_c")), gcols, "_c"
    )
    return out.select(
        *gcols,
        "n_rows",
        ((F.col("_m2") * 5).cast("double") / 1000.0).alias(alias),
    )


def _median2_int(
    df: DataFrame, gcols: Sequence[str], int_col: str
) -> DataFrame:
    """TWICE the exact per-group median of an integer column (the
    lo+hi rank-element sum, so no halving ever leaves the integers):
    group cols + n_rows + ``_m2``.  The distinct-value window shape of
    :func:`grouped_median_exact`, shared with :func:`mad_outliers`'s
    double-median."""
    counts = (
        df.select(*gcols, F.col(int_col).alias("_c"))
        .groupBy(*gcols, "_c")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy("_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*gcols)
    cum = counts.select(
        *gcols,
        "_c",
        "_cnt",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(w_all).alias("_n"),
    )
    # positions: lo = (n+1) div 2, hi = n div 2 + 1  (1-based)
    lo_pos = F.expr("(_n + 1) div 2")
    hi_pos = F.expr("_n div 2 + 1")
    prev = F.col("_cum") - F.col("_cnt")
    covers_lo = (prev < lo_pos) & (F.col("_cum") >= lo_pos)
    covers_hi = (prev < hi_pos) & (F.col("_cum") >= hi_pos)
    return cum.groupBy(*gcols).agg(
        F.max("_n").alias("n_rows"),
        (
            F.max(F.when(covers_lo, F.col("_c")))
            + F.max(F.when(covers_hi, F.col("_c")))
        ).alias("_m2"),
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k_x14826: int = 44478,
) -> DataFrame:
    """Robust per-group outliers by median absolute deviation: flag
    rows with ``|x − median| > k · 1.4826 · MAD`` (1.4826 = the normal
    consistency constant; the default ``k_x14826 = 44478`` is k = 3 as
    an integer permyriad).  MAD-based detection survives the heavy
    tails that wreck mean/σ z-scores — the robust member of the outlier
    family (zscore_normalize, iqr_outliers).

    Entirely integer: values quantize to cents, both medians come from
    :func:`_median2_int` as lo+hi rank-element SUMS (2× median and 4×
    MAD — never halved, so nothing leaves the integers), and the flag
    compares ``dev2 · 20000 > k_x14826 · mad4`` in DECIMAL(38,0).
    Engine-exact with no float anywhere before the report columns.

    Returns flagged rows: ``df`` columns + ``median`` + ``mad``
    (exact doubles, report-only).

    Scale shape: two distinct-value median passes (window input
    bounded by the value domain, not row count) + two broadcast joins
    of one-row-per-group tables back onto the fact scan — the flag
    scan itself is shuffle-free.
    """
    gcols = list(group_cols)
    cents = (F.col(value_col).cast(_DEC) * 100).cast("long")
    base = df.withColumn("_c", cents)
    med = _median2_int(base.select(*gcols, "_c"), gcols, "_c").select(
        *gcols, F.col("_m2").alias("_med2")
    )
    with_dev = base.join(F.broadcast(med), on=gcols).withColumn(
        "_dev2", F.abs(2 * F.col("_c") - F.col("_med2"))
    )
    mad4 = _median2_int(
        with_dev.select(*gcols, "_dev2"), gcols, "_dev2"
    ).select(*gcols, F.col("_m2").alias("_mad4"))
    flagged = with_dev.join(F.broadcast(mad4), on=gcols).filter(
        F.expr(
            "CAST(_dev2 AS DECIMAL(38,0)) * 20000 > "
            f"CAST(_mad4 AS DECIMAL(38,0)) * {k_x14826}"
        )
    )
    return flagged.select(
        *df.columns,
        ((F.col("_med2") * 5).cast("double") / 1000.0).alias("median"),
        ((F.col("_mad4") * 25).cast("double") / 10000.0).alias("mad"),
    )


def profile_table(
    df: DataFrame, columns: Sequence[str] | None = None
) -> DataFrame:
    """One-pass per-column profile: (col_name, n_rows, n_nulls,
    n_distinct, min_repr, max_repr) — one output row per column.

    All aggregates run in a single ``agg`` (Catalyst plans the multiple
    COUNT DISTINCTs as one Expand + aggregate pass) and the 1×4k result
    row is reshaped with ``stack`` — no ``collect``, no second scan.

    Representations are strings chosen for cross-engine stability:
    integers/strings cast directly, timestamps via ``unix_micros``
    (integer), doubles via ``%.2f`` (2-decimal data is never a rounding
    tie at 2 dp).  At 100 TB, swap ``countDistinct`` →
    ``approx_count_distinct``; everything else is already a single
    partial-aggregated pass.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    dtypes = dict(df.dtypes)

    def _repr(c: str) -> tuple[F.Column, F.Column]:
        t = dtypes[c]
        if t.startswith("timestamp"):
            # NTZ → LTZ cast is the identity under a UTC session TZ, and
            # unix_micros only accepts the LTZ flavor.
            return (
                F.unix_micros(F.min(c).cast("timestamp")).cast("string"),
                F.unix_micros(F.max(c).cast("timestamp")).cast("string"),
            )
        if t == "double" or t == "float":
            # NULL-guarded: Java's Formatter stringifies a null arg as
            # "null" and then applies the %.2f precision to IT, so an
            # empty (or all-NULL) column would print the string "nu"
            # instead of propagating NULL (zero-row audit find).
            return (
                F.when(
                    F.min(c).isNotNull(),
                    F.format_string("%.2f", F.min(c)),
                ),
                F.when(
                    F.max(c).isNotNull(),
                    F.format_string("%.2f", F.max(c)),
                ),
            )
        return F.min(c).cast("string"), F.max(c).cast("string")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        mn, mx = _repr(c)
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            mn.alias(f"{c}__min"),
            mx.alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_repr, max_repr)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_repr",
             "max_repr")


def zscore_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: Sequence[str] = (),
    scale: int = 1000,
    out_scale: int = 1_000_000,
) -> DataFrame:
    """Per-group z-score normalization (the standard feature-scaling
    step), engine-exact: values are fixed-pointed to ``scale`` units
    first, so the per-group count/sum/sum-of-squares are EXACT bigint
    sums — mean and variance then derive from three scalars with the
    same IEEE ops in any engine, instead of from an order-dependent
    float sum.  Output z is reported as ``floor(z · out_scale)``.

    Returns id_cols + (group, z_scaled); rows in zero-variance groups
    get null.

    Plan: ONE partial-aggregated groupBy producing a k-row stats table,
    broadcast back onto the scan — the normalize pass itself is
    shuffle-free, so this composes into the same stage as the read.
    """
    m = F.floor(F.col(value_col) * scale).cast("long")
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(m).alias("_s"),
        F.sum(m * m).alias("_sq"),
    )
    joined = df.select(*id_cols, group_col, m.alias("_m")).join(
        F.broadcast(stats), on=group_col
    )
    n = F.col("_n").cast("double")
    s = F.col("_s").cast("double")
    sq = F.col("_sq").cast("double")
    mean = s / n
    var = (sq - s * s / n) / n
    z = F.when(var > 0, (F.col("_m").cast("double") - mean) / F.sqrt(var))
    return joined.select(
        *id_cols,
        group_col,
        F.floor(z * out_scale).cast("long").alias("z_scaled"),
    )


def grouped_quantiles_disc(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact DISCRETE per-group quantiles: for each p, the smallest data
    value whose cumulative count reaches ``ceil(p·n)`` (1-based rank).

    Discrete selection returns actual data values — no interpolation,
    so results are bit-identical across engines even for continuous
    doubles (an interpolated quantile's ``(1-f)·a + f·b`` can differ in
    the last ulp between libm builds; picking an element cannot).

    Scale: same shape as :func:`grouped_median_exact` — aggregate to
    (group, value) counts first (one partial-aggregated shuffle), then
    window over DISTINCT values per group, bounded by value cardinality
    rather than row count.  Output: group cols + n_rows + one ``p<int>``
    column per requested quantile.
    """
    gcols = list(group_cols)
    counts = (
        df.select(*gcols, F.col(value_col).alias("_v"))
        .groupBy(*gcols, "_v")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*gcols)
    cum = counts.select(
        *gcols,
        "_v",
        "_cnt",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(w_all).alias("_n"),
    )
    prev = F.col("_cum") - F.col("_cnt")
    aggs = [F.max("_n").alias("n_rows")]
    for p in ps:
        # ceil(p·n) is the same single IEEE multiply+ceil in the oracle,
        # so both engines select the same rank for any p.
        pos = F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.lit(float(p)) * F.col("_n")).cast("bigint"),
        )
        covers = (prev < pos) & (F.col("_cum") >= pos)
        aggs.append(
            F.max(F.when(covers, F.col("_v"))).alias(f"p{round(p * 100)}")
        )
    return cum.groupBy(*gcols).agg(*aggs)


def iqr_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Rows whose ``value_col`` falls outside the per-group Tukey fences
    ``[p25 − k·IQR, p75 + k·IQR]`` (IQR = p75 − p25, discrete quantiles).

    Deterministic across engines because the fences are arithmetic over
    exact data values (no floating aggregation anywhere): discrete
    quantiles pick real elements, and ``p25 − k·(p75 − p25)`` is the
    same IEEE expression on identical inputs in Spark and the oracle.

    Scale: the fence table is one row per group — broadcast back onto
    the fact table, so the outlier scan itself is shuffle-free.
    """
    gcols = list(group_cols)
    q = grouped_quantiles_disc(df, gcols, value_col, ps=(0.25, 0.75))
    fences = q.select(
        *gcols,
        (F.col("p25") - F.lit(k) * (F.col("p75") - F.col("p25"))).alias(
            "lo_fence"
        ),
        (F.col("p75") + F.lit(k) * (F.col("p75") - F.col("p25"))).alias(
            "hi_fence"
        ),
    )
    v = F.col(value_col)
    return (
        df.join(F.broadcast(fences), on=gcols)
        .filter((v < F.col("lo_fence")) | (v > F.col("hi_fence")))
        .select(*df.columns, "lo_fence", "hi_fence")
    )


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clamp ``value_col`` into the discrete
    ``[p_lo, p_hi]`` quantile band — the standard outlier-soft-limit
    cleaning step (tail values are capped, not dropped, so row counts
    and joins downstream are unaffected).

    Deterministic across engines for the same reason as
    :func:`iqr_outliers`: the clamp bounds are actual data values
    picked by discrete rank selection, and ``CASE WHEN v < lo ...`` is
    exact on identical inputs.

    Scale: one (group, value)-bounded quantile pass; the per-group
    bound table (one row per group) broadcasts back onto the fact scan,
    so the clamp itself is a shuffle-free map stage.
    """
    gcols = list(group_cols)
    out_col = out_col or f"{value_col}_wins"
    q = grouped_quantiles_disc(df, gcols, value_col, ps=(p_lo, p_hi))
    plo, phi = (
        f"p{int(round(p_lo * 100))}",
        f"p{int(round(p_hi * 100))}",
    )
    bounds = q.select(
        *gcols,
        F.col(plo).alias("_lo"),
        F.col(phi).alias("_hi"),
    )
    v = F.col(value_col)
    clamped = (
        F.when(v < F.col("_lo"), F.col("_lo"))
        .when(v > F.col("_hi"), F.col("_hi"))
        .otherwise(v)
    )
    return (
        df.join(F.broadcast(bounds), on=gcols)
        .select(*df.columns, clamped.alias(out_col))
        .drop("_lo", "_hi")
    )


def approx_profile(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    quantile_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    rsd: float = 0.01,
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based profiling — the 100 TB replacement for the exact
    distinct/quantile passes: HyperLogLog++ (``approx_count_distinct``,
    relative error ``rsd``) and the KLL-style ``percentile_approx``
    (rank error 1/``accuracy``), both single-pass, partial-aggregating,
    fixed-memory.

    Exact distinct counts shuffle every distinct value; exact quantiles
    shuffle every distinct (group, value) pair into a window sort.  The
    sketches shuffle a few KB per group whatever the input size — this
    is the only honest way to profile a petabyte.  Outputs are
    approximate BY DESIGN (sketch merge order is engine-specific), so
    this operator has no cross-engine oracle; its error bound is
    asserted against the exact operators in the test suite.
    """
    qcol = F.col(quantile_col).cast("double")
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(distinct_col, rsd=rsd).alias(
            "approx_distinct"
        ),
        F.percentile_approx(
            qcol, list(quantiles), accuracy
        ).alias("approx_quantiles"),
    )


def embedding_dim_profile(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-dimension statistics over an ``array<float>`` embedding
    column — the feature-scaling precursor (per-dim min/max/mean feed
    normalization, quantization ranges, and drift monitors).

    Values are fixed-pointed (``FLOOR(x·scale)`` as bigint) BEFORE
    aggregation, so count/sum/min/max are partition-order-invariant and
    engine-exact.  Returns (dim, n, sum_fp, min_fp, max_fp) with ``dim``
    0-based.

    Scale shape: posexplode fans each row out to ``dims`` rows, but the
    aggregation partial-combines per task to ≤ dims rows before the one
    shuffle — exchange volume is O(tasks × dims), independent of corpus
    size.  (An explode-free alternative folds per-row into an array
    accumulator, but loses min/max codegen; at dims ≤ a few hundred the
    explode form benchmarks faster.)
    """
    fp = F.floor(F.col("v").cast("double") * F.lit(scale)).cast("bigint")
    return (
        df.select(F.posexplode(F.col(vec_col)).alias("dim", "v"))
        .select(F.col("dim"), fp.alias("vfp"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vfp").alias("sum_fp"),
            F.min("vfp").alias("min_fp"),
            F.max("vfp").alias("max_fp"),
        )
    )


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    width: float = 8.0,
) -> DataFrame:
    """Distribution drift between two snapshots of the same column —
    the training-data monitor for "did this crawl/source shift under
    me".  Per histogram bin, both snapshots' counts plus the bin's
    contribution to total-variation distance; TVD is reported in
    EXACT integer permille:

        tvd = ½ · Σᵢ |pᵢ − qᵢ|
            = Σᵢ |nᵃᵢ·N_b − nᵇᵢ·N_a| · 1000  div  (2·N_a·N_b)

    — cross-multiplied so no float ratio is ever formed (engine-exact,
    unlike PSI/KL whose logs drift in the last ulp).  The per-bin
    ``drift_contrib_permille`` decomposes the distance so the shifted
    region is attributable.

    Scale shape: two independent histogram aggregations (each a
    partial-combined single pass, exchange O(tasks × bins)) + a
    full-outer join on the tiny bin table + a 1-row total broadcast.
    """
    ha = histogram_fixed_width(df_a, value_col, width, sum_micros=False)
    hb = histogram_fixed_width(df_b, value_col, width, sum_micros=False)
    a = ha.select("bin", "bin_lo", F.col("n").alias("n_a"))
    b = hb.select("bin", "bin_lo", F.col("n").alias("n_b"))
    merged = a.join(b, ["bin", "bin_lo"], "full_outer").select(
        "bin",
        "bin_lo",
        F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
    )
    totals = merged.agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    return (
        merged.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "bin_lo",
            "n_a",
            "n_b",
            # Empty-snapshot guard: with tot_a or tot_b = 0 the div is
            # undefined (Spark yields NULL, DuckDB errors) — emit NULL
            # explicitly so both engines agree on the degenerate input.
            F.expr(
                "CASE WHEN tot_a = 0 OR tot_b = 0 THEN NULL"
                " ELSE abs(n_a * tot_b - n_b * tot_a) * 1000"
                " div (2 * tot_a * tot_b) END"
            ).alias("drift_contrib_permille"),
        )
    )


def partition_fingerprints(
    df: DataFrame,
    partition_col: str,
    cols: list[str] | None = None,
) -> DataFrame:
    """Order-independent content fingerprint per partition:
    (partition, n_rows, fingerprint) where fingerprint =
    SUM of a per-row md5-derived hash over ``cols`` (all non-partition
    columns by default, sorted by name for a stable definition),
    accumulated exactly in DECIMAL(38,0) and reduced mod 2^63.
    Addition commutes, so the fingerprint is identical regardless of
    row order, partition split, or engine — the property that makes it
    a cross-engine snapshot digest.  A SUM (multiset hash) rather than
    XOR: XOR cancels duplicate rows pairwise, so two copies of row A
    and two copies of row B would both fold to 0 and a real change
    could classify as unchanged.

    NULLs fold as an out-of-band sentinel (0x00-prefixed, which no cast
    string produces), so NULL ≠ 'NULL' ≠ ''.

    Scale shape: one partial-aggregated shuffle keyed on the partition
    value — the same cost as a COUNT(*) GROUP BY.  This is the
    incremental-recompute primitive: fingerprint yesterday's and
    today's lake, diff (see :func:`changed_partitions`), and reprocess
    ONLY partitions whose fingerprint moved — at 100 TB the difference
    between touching 3 partitions and re-reading the lake.
    """
    from ..functions.text import md5_hash64

    if cols is None:
        cols = sorted(c for c in df.columns if c != partition_col)
    sep = "\x1f"
    parts = []
    for c in cols:
        parts.append(
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
        )
    row_h = md5_hash64(F.concat_ws(sep, *parts))
    return (
        df.select(F.col(partition_col), row_h.alias("_h"))
        .groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # Exact 38-digit accumulation (no int64 wrap, which is
            # ANSI-mode- and engine-dependent), then mod 2^63 back into
            # a non-negative BIGINT.  DuckDB mirrors this with a
            # HUGEINT sum — see _sql_snapshot_diff.
            F.expr(
                "CAST(pmod(SUM(CAST(_h AS DECIMAL(38,0))), "
                "9223372036854775808) AS BIGINT)"
            ).alias("fingerprint"),
        )
    )


def changed_partitions(
    fp_old: DataFrame,
    fp_new: DataFrame,
    partition_col: str,
) -> DataFrame:
    """Diff two partition-fingerprint tables →
    (partition, status ∈ added|removed|changed, rows_old, rows_new).
    Unchanged partitions are dropped — the output IS the reprocessing
    work list.  A full-outer join over the tiny fingerprint tables;
    the underlying data is never rescanned.
    """
    o = fp_old.select(
        F.col(partition_col),
        F.col("n_rows").alias("rows_old"),
        F.col("fingerprint").alias("_fo"),
    )
    n = fp_new.select(
        F.col(partition_col),
        F.col("n_rows").alias("rows_new"),
        F.col("fingerprint").alias("_fn"),
    )
    j = o.join(n, on=partition_col, how="full_outer")
    status = (
        F.when(F.col("_fo").isNull(), F.lit("added"))
        .when(F.col("_fn").isNull(), F.lit("removed"))
        .when(
            (F.col("_fo") != F.col("_fn"))
            | (F.col("rows_old") != F.col("rows_new")),
            F.lit("changed"),
        )
    )
    return (
        j.select(
            partition_col,
            status.alias("status"),
            "rows_old",
            "rows_new",
        )
        .filter(F.col("status").isNotNull())
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 100,
) -> DataFrame:
    """EXACT heavy hitters — every value occurring in more than
    ``n/k`` of the rows, with exact counts — in two bounded-memory
    passes (the classic distributed Misra-Gries shape):

    1. Each partition streams through a local Misra-Gries summary of
       ``k`` counters (Arrow-batched ``mapInPandas``; memory is O(k)
       per task no matter how many rows).  If a value has global
       frequency > n/k then by pigeonhole it beats n_p/k in at least
       one partition, so the union of local candidates provably
       contains every global heavy hitter — no false negatives.
    2. The (tiny) candidate set broadcasts back as a semi-join filter
       and ONLY candidate rows are exactly counted; the n·k > total
       gate then drops the false positives.

    The output is therefore exact and partitioning-independent —
    verifiable against a plain GROUP BY/HAVING oracle — while the
    full-cardinality shuffle of a naive word count never happens: the
    count shuffle carries candidate values only (≤ k × partitions).
    """
    src = df.select(F.col(value_col).alias("_v"))

    def mg(batches):
        # Batched Misra-Gries via the mergeable-summaries rule
        # (Agarwal et al., PODS'12): merge exact per-batch counts into
        # the summary, then subtract the (k+1)-th largest counter and
        # drop non-positives.  Counting is a vectorized value_counts
        # per Arrow batch (no per-row Python loop); the merged summary
        # keeps the f(v) ≥ n/(k+1) guarantee, which the n·k > total
        # recount gate strictly dominates.
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v, c in pdf["_v"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: cnt - sub
                    for key, cnt in counters.items()
                    if cnt > sub
                }
        yield pd.DataFrame({"_v": list(counters.keys())})

    # Schema is derived from the input column, not hard-coded: the
    # candidate frame must round-trip through Arrow with the SAME type
    # as the source (bigint join keys are the typical input), or the
    # broadcast semi-join below would compare mismatched types.
    cands = src.mapInPandas(mg, schema=src.schema).distinct()
    total = src.agg(F.count(F.lit(1)).alias("_n"))
    counted = (
        src.join(F.broadcast(cands), on="_v", how="left_semi")
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("n_rows") * k > F.col("_n"))
        .select(
            F.col("_v").alias(value_col),
            "n_rows",
            F.expr("1000 * n_rows div _n").alias("share_permille"),
        )
    )


def fk_containment(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
) -> DataFrame:
    """Foreign-key candidate profiling: what fraction of the child
    column's DISTINCT values exist in the parent column — the
    schema-discovery signal behind join recommendations and referential
    data-quality scoring (containment 1000‰ = a clean FK; 0‰ = the
    join the user is about to write returns nothing).

    Returns one row: (n_child_distinct, n_matched,
    containment_permille), NULL-safe (NULL child values are not
    countable FK references and are excluded, matching SQL FK
    semantics).

    Scale shape: both sides reduce to distinct value sets FIRST
    (partial-agged, so the shuffle carries unique values only), then
    one left-semi equi-join between the distinct sets — never a join
    of the raw tables.
    """
    c = (
        child.select(F.col(child_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .distinct()
    )
    p = (
        parent.select(F.col(parent_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .distinct()
    )
    # One pass: a left join against the distinct parent set (no row
    # multiplication — p is distinct) carries a match flag, so both
    # counts come from a single aggregation instead of evaluating the
    # child-distinct shuffle twice (semi-join + count) — round-14.
    return (
        c.join(p.withColumn("_m", F.lit(1)), on="_v", how="left")
        .agg(
            F.count(F.lit(1)).alias("n_child_distinct"),
            F.count("_m").alias("n_matched"),
        )
        .select(
            "n_child_distinct",
            "n_matched",
            F.expr(
                "CASE WHEN n_child_distinct > 0 THEN "
                "1000 * n_matched div n_child_distinct ELSE 0 END"
            ).alias("containment_permille"),
        )
    )


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema-contract diff between two snapshots: one row per column
    that was added, removed, or changed type — the complement of the
    CONTENT diff (:func:`partition_fingerprints`): fingerprints catch
    value drift, this catches shape drift (a provider silently turning
    an int64 into a string is the classic silent breaker of downstream
    jobs).

    Returns (column, status ∈ added|removed|type_changed, old_type,
    new_type).  Purely metadata — no data is scanned; the result is a
    driver-built DataFrame so it composes with the rest of a data-
    quality report.
    """
    spark = old.sparkSession
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    rows = []
    for c in sorted(set(o) | set(n)):
        if c not in n:
            rows.append((c, "removed", o[c], None))
        elif c not in o:
            rows.append((c, "added", None, n[c]))
        elif o[c] != n[c]:
            rows.append((c, "type_changed", o[c], n[c]))
    return spark.createDataFrame(
        rows,
        "column string, status string, old_type string, new_type string",
    )


def quantile_bins(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float] = (0.25, 0.5, 0.75),
    out_col: str = "bin",
) -> DataFrame:
    """Equi-depth discretization: assign every row its per-group
    quantile bucket (1..len(ps)+1) — the quantile-binning step of
    GBDT-style feature engineering and of building equi-depth
    histograms, WITHOUT the per-row NTILE sort that the naive form
    pays (a full per-group sort of raw rows).

    The boundaries come from :func:`grouped_quantiles_disc` (exact
    discrete values, engine-identical); the one-row-per-group boundary
    table broadcasts back onto the fact scan, so the assignment itself
    is a shuffle-free map stage.  Bucket rule: bin k is
    ``value ≤ p_k`` boundary, strictly-greater falls through — ties on
    a boundary always bin low, deterministic on identical inputs.
    """
    gcols = list(group_cols)
    q = grouped_quantiles_disc(df, gcols, value_col, ps=ps)
    pcols = [f"p{int(p * 100)}" for p in ps]
    bounds = q.select(*gcols, *pcols)
    expr = F.lit(len(ps) + 1)
    for i in range(len(ps) - 1, -1, -1):
        expr = F.when(
            F.col(value_col) <= F.col(pcols[i]), F.lit(i + 1)
        ).otherwise(expr)
    return (
        df.join(F.broadcast(bounds), on=gcols)
        .withColumn(out_col, expr.cast("int"))
        .drop(*pcols)
    )


def contingency_lift(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Contingency table with independence lift: for every
    (row, column) category pair, the observed count and
    ``lift_permille = 1000·n·N div (row_total·col_total)`` — the
    observed/expected-under-independence ratio (1000 ≈ independent,
    ≫1000 = the categories co-occur; the integer-permille cousin of a
    χ² cell contribution).  The association-mining view of two
    categorical columns (which languages concentrate in which sources,
    which event types cluster on which days).

    Scale shape: one hash-agg to the (row, col) cell table; marginals
    and the grand total are windows over the CELL table (cardinality =
    |rows|×|cols|, tiny), never re-scans of the input.
    """
    cells = df.groupBy(row_col, col_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    # DECIMAL(38,0) headroom: n·N is rows² and wraps int64 past ~3e9
    # rows; the marginal product likewise
    return cells.select(
        row_col,
        col_col,
        "n",
        F.expr(
            "CAST(CAST(1000 AS DECIMAL(38,0)) * n * "
            "SUM(n) OVER (PARTITION BY 1) DIV "
            f"(CAST(SUM(n) OVER (PARTITION BY {row_col}) AS DECIMAL(38,0))"
            f" * SUM(n) OVER (PARTITION BY {col_col})) AS BIGINT)"
        ).alias("lift_permille"),
    )


def row_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    cols: list[str] | None = None,
) -> DataFrame:
    """Row-level snapshot diff — the fine-grained companion of
    :func:`changed_partitions`: classify every key as added / removed /
    changed between two snapshots, dropping untouched rows.  This is
    the change-data-capture extraction a downstream incremental
    consumer replays (the work list at ROW granularity, where
    ``changed_partitions`` gives it at partition granularity).

    ``key_cols`` must be a primary key of both sides (one row per key;
    duplicate keys make "changed" ill-defined).  Value comparison is
    the same md5-derived row hash as :func:`partition_fingerprints`
    (NULL folds as an out-of-band sentinel, so NULL ≠ 'NULL' ≠ '').
    ``cols`` defaults to the sorted non-key columns common to both
    sides.

    Returns (key_cols..., status ∈ added|removed|changed).

    Scale shape: each side reduces to (key, hash) at scan time — the
    join carries two thin columns, not the row payload — then ONE
    key-keyed full-outer hash join; the filter keeps only the changed
    tail, so output size is the churn, not the table.
    """
    from ..functions.text import md5_hash64

    if cols is None:
        shared = set(old.columns) & set(new.columns)
        cols = sorted(shared - set(key_cols))
    sep = "\x1f"

    def hashed(df: DataFrame, out: str) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in cols
        ]
        return df.select(
            *[F.col(k) for k in key_cols],
            md5_hash64(F.concat_ws(sep, *parts)).alias(out),
        )

    o = hashed(old, "_ho")
    n = hashed(new, "_hn")
    for k in key_cols:
        n = n.withColumnRenamed(k, f"_n_{k}")
    cond = None
    for k in key_cols:
        c = o[k].eqNullSafe(n[f"_n_{k}"])
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    status = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
    )
    return (
        joined.select(
            *[
                F.coalesce(o[k], n[f"_n_{k}"]).alias(k)
                for k in key_cols
            ],
            status.alias("status"),
        )
        .filter(F.col("status").isNotNull())
    )


def gini_concentration(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-group Gini coefficient of a value's distribution — the
    concentration audit a curation pipeline runs on contribution sizes
    (is one crawl dump / one author / one day supplying most of a
    source's bytes?): 0 = perfectly even, →1 = one row owns
    everything.

    Exact integer form over the sorted values x_1 ≤ … ≤ x_n:
    ``gini = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)``, computed in
    DECIMAL(38,0) and floored to permille — ties contribute the same
    Σ i·x_i under any tie order, so the result is deterministic on
    every engine with no tiebreak column needed.  Groups with a
    non-positive value total are dropped (Gini is undefined there).

    Returns (group_cols..., gini_permille, n_rows, total).

    Scale shape: ONE key-keyed rank window + ONE partial-agged groupBy
    riding the same shuffle key (the sessionize cost); no self-joins,
    no global sort — the rank is per group.
    """
    keys = [F.col(c) for c in group_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    ranked = df.select(
        *keys,
        F.col(value_col).cast("long").alias("_x"),
        F.row_number().over(w).alias("_i"),
    )
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_x").cast("long").alias("total"),
            F.expr(
                "CAST(SUM(CAST(_i AS DECIMAL(38,0)) * _x) AS DECIMAL(38,0))"
            ).alias("_ixsum"),
        )
        .filter(F.col("total") > 0)
        .select(
            *group_cols,
            F.expr(
                "CAST((2 * _ixsum - (CAST(n_rows AS DECIMAL(38,0)) + 1)"
                " * total) * 1000 DIV (CAST(n_rows AS DECIMAL(38,0))"
                " * total) AS BIGINT)"
            ).alias("gini_permille"),
            "n_rows",
            "total",
        )
    )


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    cents: int = 2,
) -> DataFrame:
    """Pairwise Pearson correlation of numeric columns, cross-engine
    deterministic: the per-column inputs are fixed-pointed to integers
    (DECIMAL cast at ``cents`` decimals × 10^cents), every moment sum
    (n, Σx, Σx², Σxy) is EXACT DECIMAL(38,0) arithmetic, and only the
    final ratio touches floating point — decimal→double cast, one
    multiply, one IEEE sqrt, one divide, then floor to 1e6 fixed point.
    Identical exact sums → identical doubles → identical e6 integers on
    any engine (the gini/collocations fixed-point discipline).

    Returns one row per unordered column pair (col_a < col_b by the
    order given): (col_a, col_b, n, corr_e6); pairs whose variance
    term is zero are reported with corr_e6 NULL.

    Scale shape: ONE whole-table aggregate computes every moment in a
    single pass (k + k·(k+1)/2 partial-agged sums — map-side combine
    does nearly all the work); the pair table is then unpivoted from
    the single result row with ONE explode — not a union of selects,
    which would re-plan (and at scale re-SCAN) the aggregate once per
    pair.  This is the classic moments-based one-pass correlation,
    numerically safe here because the sums are exact decimals, not
    floats.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    scale = 10 ** cents

    def _ival(c: str):
        return F.expr(
            f"CAST(CAST({c} AS DECIMAL(18,{cents})) * {scale}"
            " AS DECIMAL(38,0))"
        )

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(_ival(c)).alias(f"_s_{c}"))
        aggs.append(F.sum(_ival(c) * _ival(c)).alias(f"_ss_{c}"))
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1:]
    ]
    for a, b in pairs:
        aggs.append(F.sum(_ival(a) * _ival(b)).alias(f"_sp_{a}_{b}"))
    m = df.agg(*aggs)

    structs = []
    for a, b in pairs:
        num = F.expr(
            f"CAST(_n AS DECIMAL(38,0)) * _sp_{a}_{b} - _s_{a} * _s_{b}"
        )
        dx = F.expr(
            f"CAST(_n AS DECIMAL(38,0)) * _ss_{a} - _s_{a} * _s_{a}"
        )
        dy = F.expr(
            f"CAST(_n AS DECIMAL(38,0)) * _ss_{b} - _s_{b} * _s_{b}"
        )
        corr = F.when(
            (dx > 0) & (dy > 0),
            F.floor(
                F.lit(1000000.0)
                * num.cast("double")
                / F.sqrt(dx.cast("double") * dy.cast("double"))
            ).cast("long"),
        )
        structs.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                corr.alias("corr_e6"),
            )
        )
    return m.select(
        F.col("_n").alias("n"), F.explode(F.array(*structs)).alias("_p")
    ).select("_p.col_a", "_p.col_b", "n", "_p.corr_e6")


def jackknife_mean(
    df: DataFrame,
    value_col: str,
    key_col: str,
    folds: int = 20,
    scale: int = 100,
) -> DataFrame:
    """Delete-d jackknife standard error of the mean — the error bar
    you can actually compute at 100 TB: hash rows into ``folds``
    deterministic groups (md5, engine-portable), compute each
    leave-one-fold-out mean from the per-fold (sum, count) table, and
    estimate Var(mean) = (G-1)/G * sum_g (m_g - m_bar)^2.

    One aggregation pass (map-side combinable) produces the G-row
    fold table; everything after runs on G rows.  The fold table is
    MERGEABLE (sums and counts add), so per-day fold tables roll up
    to a month's jackknife without touching raw data — the same
    mergeability argument as ``operators/sketches.py``.

    Exactness: fold sums/counts are exact integers (``value_col``
    scaled by ``scale`` and floored); the leave-one-out means and the
    variance combine exact integers in double precision only at the
    end, identically on any engine.  Output: one row (n, n_folds,
    mean_e6, se_e6) with values in e6 fixed-point of the original
    unit.
    """
    v = F.floor(F.col(value_col).cast("double") * scale).cast("long")
    # fold assignment hashes an INTEGER key column (md5 of its string
    # form) — never the value itself: double-to-string rendering is
    # not engine-portable, integer rendering is.
    fold = (
        F.conv(
            F.substring(
                F.md5(F.col(key_col).cast("string")), 1, 12
            ),
            16,
            10,
        ).cast("long")
        % folds
    )
    per_fold = (
        df.select(v.alias("v"), fold.alias("g"))
        .groupBy("g")
        .agg(
            F.sum("v").alias("s_g"),
            F.count("*").alias("n_g"),
        )
    )
    tot = per_fold.agg(
        F.sum("s_g").alias("s"),
        F.sum("n_g").alias("n"),
        F.count("*").alias("g_used"),
    )
    j = per_fold.crossJoin(F.broadcast(tot))
    # leave-one-out mean of fold g: (S - s_g) / (N - n_g).  Per-fold
    # doubles are deterministic (same op sequence on exact ints), but
    # a cross-engine SUM of doubles is order-dependent — so each
    # fold's squared deviation is floored to e4 fixed-point FIRST
    # (of the scaled unit squared — deviations are O(scaled cents),
    # so e4 keeps ~12 significant digits while staying far inside
    # int64) and the sum runs exact (the same order-independence
    # contract as every integer-permille op in this package).
    loo = (F.col("s") - F.col("s_g")).cast("double") / (
        F.col("n") - F.col("n_g")
    ).cast("double")
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    dev2_e4 = F.floor((loo - mean) * (loo - mean) * 1.0e4).cast(
        "decimal(38,0)"
    )
    out = j.groupBy("n", "g_used", "s").agg(
        F.sum(dev2_e4).alias("ssd_e4")
    )
    e6 = 1000000.0 / scale
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("g_used").cast("int").alias("n_folds"),
        F.floor(
            F.lit(e6) * F.col("s").cast("double") / F.col("n").cast("double")
        ).cast("long").alias("mean_e6"),
        F.floor(
            F.lit(e6)
            * F.sqrt(
                F.col("ssd_e4").cast("double")
                / F.lit(1.0e4)
                * (F.col("g_used") - 1).cast("double")
                / F.col("g_used").cast("double")
            )
        ).cast("long").alias("se_e6"),
    )


def permutation_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    key_col: str,
    group_a,
    group_b,
    n_perm: int = 64,
    scale: int = 100,
) -> DataFrame:
    """Two-sample permutation test for a difference in means —
    distribution-free significance without normality assumptions,
    the honest test when 100 TB of skewed data laughs at a t-test.

    DETERMINISTIC randomization: the key hashes ONCE per row
    (md5, engine-portable); permutation b reassigns the row by BIT b
    of that 128-bit digest (hex digit b//4, bit b%4) — no RNG state,
    reproducible on any engine and any partitioning (the same
    RNG-free discipline as ``operators/sampling.py``), and the md5
    cost is per ROW, not per row-permutation (n_perm <= 128).  The p-value uses the standard
    add-one correction: p = (1 + #{b : |diff_b| >= |diff_obs|}) /
    (n_perm + 1).

    Scale shape: the observed stat is one aggregation; the
    permutation fan-out explodes ``n_perm`` rows per input row but
    map-side combine collapses each task to ``2 * n_perm`` partial
    sums before the shuffle — the exchange is O(tasks * n_perm),
    independent of row count.  All sums are exact integers; doubles
    appear only in the per-permutation mean difference (same-op
    determinism).

    Output: one row (n_a, n_b, diff_e6, n_extreme, p_e6).
    """
    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        F.floor(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("v"),
        (F.col(group_col) == group_a).alias("is_a"),
        F.col(key_col).cast("string").alias("k"),
    )
    obs = base.agg(
        F.sum(F.when(F.col("is_a"), F.col("v"))).alias("sa"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(~F.col("is_a"), F.col("v"))).alias("sb"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("nb"),
    ).select(
        "na",
        "nb",
        (
            F.col("sa").cast("double") / F.col("na").cast("double")
            - F.col("sb").cast("double") / F.col("nb").cast("double")
        ).alias("diff_obs"),
    )
    if not 1 <= n_perm <= 128:
        raise ValueError("n_perm must be in [1, 128] (md5 bit budget)")
    perms = base.select(
        "v",
        F.md5(F.col("k")).alias("h"),
    ).select(
        "v",
        "h",
        F.explode(
            F.array(*[F.lit(b) for b in range(n_perm)])
        ).alias("b"),
    ).withColumn(
        "to_a",
        F.expr(
            "(cast(conv(substring(h, cast(b div 4 as int) + 1, 1),"
            " 16, 10) as int) div shiftleft(1, cast(b % 4 as int))) % 2"
        )
        == 0,
    )
    per_b = perms.groupBy("b").agg(
        F.sum(F.when(F.col("to_a"), F.col("v"))).alias("s1"),
        F.sum(F.when(F.col("to_a"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("to_a"), F.col("v"))).alias("s0"),
        F.sum(F.when(~F.col("to_a"), 1).otherwise(0)).alias("n0"),
    )
    diffs = per_b.filter(
        (F.col("n1") > 0) & (F.col("n0") > 0)
    ).select(
        "b",
        (
            F.col("s1").cast("double") / F.col("n1").cast("double")
            - F.col("s0").cast("double") / F.col("n0").cast("double")
        ).alias("diff_b"),
    )
    j = diffs.crossJoin(F.broadcast(obs))
    # Constant-key GROUPED aggregate: on an empty input slice (no rows
    # in either group) there are no permutation diffs, and the result
    # must be EMPTY (rows iff data) — a global agg would fabricate one
    # all-NULL row the oracle doesn't emit.
    counted = j.groupBy(F.lit(1).alias("_g")).agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.max("diff_obs").alias("diff_obs"),
        F.sum(
            F.when(
                F.abs(F.col("diff_b")) >= F.abs(F.col("diff_obs")), 1
            ).otherwise(0)
        ).alias("n_extreme"),
        F.count("*").alias("n_used"),
    )
    e6 = 1000000.0 / scale
    return counted.drop("_g").select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.floor(F.lit(e6) * F.col("diff_obs")).cast("long").alias(
            "diff_e6"
        ),
        F.col("n_extreme").cast("long").alias("n_extreme"),
        F.floor(
            F.lit(1000000.0)
            * (1 + F.col("n_extreme")).cast("double")
            / (F.col("n_used") + 1).cast("double")
        ).cast("long").alias("p_e6"),
    )


def spearman_corr(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Spearman rank correlation — Pearson on average ranks, the
    robust association measure that survives the outliers and
    nonlinearity that wreck raw Pearson (its sibling
    :func:`corr_matrix` covers the linear case).

    Scalable ranking WITHOUT sorting raw rows (the
    ``grouped_median_exact`` argument): each column aggregates to its
    DISTINCT-VALUE table with counts, a cumulative window over those
    bounded distinct values assigns every value its doubled average
    rank ``2*prev_cum + cnt + 1`` (doubled so midpoint ranks stay
    integer), and the fact table equi-joins the two rank maps.  The
    correlation then runs the corr_matrix exact-decimal moment pass
    over the integer doubled ranks, floats only in the final ratio.
    (DECIMAL(38,0) bounds the exact moment pass at roughly n <= 1e8
    rows; beyond that, rank on a pre-aggregated value table.)

    Output: one row (n, spearman_e6).
    """
    d38 = "decimal(38,0)"

    def rank2_map(col: str, out: str) -> DataFrame:
        counts = (
            df.select(F.col(col).alias("_v"))
            .groupBy("_v")
            .agg(F.count("*").alias("_cnt"))
        )
        w = Window.orderBy("_v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return counts.select(
            "_v",
            (
                2 * (F.sum("_cnt").over(w) - F.col("_cnt"))
                + F.col("_cnt")
                + 1
            ).alias(out),
        )

    rx = rank2_map(col_x, "rx2")
    ry = rank2_map(col_y, "ry2")
    ranked = (
        df.select(
            F.col(col_x).alias("_x"), F.col(col_y).alias("_y")
        )
        .join(rx.withColumnRenamed("_v", "_x"), "_x")
        .join(ry.withColumnRenamed("_v", "_y"), "_y")
        .select(
            F.col("rx2").cast(d38).alias("rx2"),
            F.col("ry2").cast(d38).alias("ry2"),
        )
    )
    m = ranked.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.when(
            (dx > 0) & (dy > 0),
            F.floor(
                F.lit(1000000.0)
                * num.cast("double")
                / F.sqrt(dx.cast("double") * dy.cast("double"))
            ),
        )
        .cast("long")
        .alias("spearman_e6"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test — the rank-based
    two-sample location test: unlike the t-test it needs no
    normality, and unlike :func:`permutation_test` it has a
    closed-form null, so it costs ONE ranking pass instead of B
    permutation sums.

    Ranks come from the pooled DISTINCT-VALUE table with cumulative
    counts (the spearman_corr machinery — never a global sort of raw
    rows), doubled so tie midpoints stay integer.  U, its null mean,
    and the tie-corrected variance

        var = na*nb/12 * [(n+1) - sum(t^3 - t) / (n*(n-1))]

    all evaluate from exact integers (the tie term aggregates over
    the bounded distinct-value table); the standardized z floors to
    e6 from exact operands only at the end.

    Output: one row (n_a, n_b, u2 — doubled U so tie halves stay
    integer — and z_e6).
    """
    d38 = "decimal(38,0)"
    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(value_col).alias("_v"),
        (F.col(group_col) == group_a).alias("is_a"),
    )
    counts = base.groupBy("_v").agg(
        F.count("*").alias("_cnt"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("_ca"),
    )
    w = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = counts.select(
        "_cnt",
        "_ca",
        (
            2 * (F.sum("_cnt").over(w) - F.col("_cnt"))
            + F.col("_cnt")
            + 1
        ).alias("rank2"),
    )
    m = ranked.agg(
        F.sum(F.col("_cnt")).cast(d38).alias("n"),
        F.sum(F.col("_ca")).cast(d38).alias("na"),
        F.sum(F.col("_ca") * F.col("rank2")).cast(d38).alias("r2a"),
        F.sum(
            F.col("_cnt") * F.col("_cnt") * F.col("_cnt")
            - F.col("_cnt")
        )
        .cast(d38)
        .alias("tie3"),
    )
    nb = F.col("n") - F.col("na")
    # doubled U: U = R_a - na(na+1)/2  ->  U2 = R2_a - na(na+1)
    u2 = F.col("r2a") - F.col("na") * (F.col("na") + 1)
    mean_u2 = F.col("na") * nb  # doubled null mean (2 * na*nb/2)
    # var(U) with tie correction, computed in doubles of exact ints
    n_d = F.col("n").cast("double")
    var_u = (
        F.col("na").cast("double")
        * nb.cast("double")
        / 12.0
        * (
            (n_d + 1.0)
            - F.col("tie3").cast("double") / (n_d * (n_d - 1.0))
        )
    )
    return m.select(
        F.col("na").cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        u2.cast("long").alias("u2"),
        F.when(
            var_u > 0,
            F.floor(
                F.lit(1000000.0)
                * ((u2 - mean_u2).cast("double") / 2.0)
                / F.sqrt(var_u)
            ),
        )
        .cast("long")
        .alias("z_e6"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic — the any-difference
    detector (location, scale, OR shape) that complements the
    location-only rank tests: D = max_x |F_a(x) - F_b(x)| over the
    pooled empirical CDFs.

    Exact-integer formulation on the distinct-value table: at each
    distinct value, |cum_a * n_b - cum_b * n_a| is an exact integer;
    D = max of that over values, divided by n_a*n_b only in the final
    e6 floor.  One aggregation + one bounded cumulative window —
    the same never-sort-raw-rows shape as spearman/mann-whitney.

    Output: one row (n_a, n_b, d_e6, crit_ks_e6) where crit_ks_e6 is
    the 95% two-sided critical value 1.358*sqrt((na+nb)/(na*nb)) —
    carried so the row is a self-contained accept/reject readout.
    """
    d38 = "decimal(38,0)"
    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(value_col).alias("_v"),
        (F.col(group_col) == group_a).alias("is_a"),
    )
    counts = base.groupBy("_v").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("_ca"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("_cb"),
    )
    w = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        F.sum("_ca").over(w).cast(d38).alias("cum_a"),
        F.sum("_cb").over(w).cast(d38).alias("cum_b"),
    )
    tot = base.agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0))
        .cast(d38)
        .alias("na"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
        .cast(d38)
        .alias("nb"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    gap = F.abs(
        F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na")
    )
    out = j.groupBy("na", "nb").agg(F.max(gap).alias("max_gap"))
    na_d = F.col("na").cast("double")
    nb_d = F.col("nb").cast("double")
    return out.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.floor(
            F.lit(1000000.0)
            * F.col("max_gap").cast("double")
            / (na_d * nb_d)
        )
        .cast("long")
        .alias("d_e6"),
        F.floor(
            F.lit(1000000.0)
            * F.lit(1.358)
            * F.sqrt((na_d + nb_d) / (na_d * nb_d))
        )
        .cast("long")
        .alias("crit_ks_e6"),
    )


def kendall_tau(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Kendall's tau-b — rank association by concordant/discordant
    pair counting, the third member of the association family
    (:func:`corr_matrix` linear, :func:`spearman_corr` monotone-rank).

    Scalable shape: NEVER the naive O(n²) over raw rows.  The fact
    table folds to its (x, y) CONTINGENCY grid first (bounded by the
    product of distinct-value counts, not row count), then one
    self-join over grid cells — each cell pair classified
    concordant / discordant / x-tie / y-tie with exact integer
    products of cell counts.  Within-cell pairs are ties in both and
    drop out of tau-b by definition.  Floats appear only in the final
    ratio: ``tau_b = (C − D) / sqrt((C+D+Tx) · (C+D+Ty))``, emitted
    as ``floor(1e6·…)`` with both engines computing the identical
    double expression.

    Output: one row (n, n_concordant, n_discordant, tau_b_e6).
    """
    cells = (
        df.select(F.col(col_x).alias("x"), F.col(col_y).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = cells.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"),
        F.col("c").alias("ca"),
    )
    b = cells.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"),
        F.col("c").alias("cb"),
    )
    # each unordered cell pair once: lexicographic (x, y) order
    pairs = a.join(
        b,
        (F.col("xa") < F.col("xb"))
        | ((F.col("xa") == F.col("xb")) & (F.col("ya") < F.col("yb"))),
    )
    prod = (F.col("ca") * F.col("cb")).cast("long")
    agg = pairs.agg(
        F.sum(
            F.when(
                (F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")),
                prod,
            ).otherwise(F.lit(0))
        ).alias("conc"),
        F.sum(
            F.when(
                (F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")),
                prod,
            ).otherwise(F.lit(0))
        ).alias("disc"),
        F.sum(
            F.when(F.col("xa") == F.col("xb"), prod).otherwise(F.lit(0))
        ).alias("tx"),
        F.sum(
            F.when(F.col("ya") == F.col("yb"), prod).otherwise(F.lit(0))
        ).alias("ty"),
    )
    n = df.agg(F.count(F.lit(1)).alias("n"))
    return n.crossJoin(F.broadcast(agg)).select(
        "n",
        F.col("conc").alias("n_concordant"),
        F.col("disc").alias("n_discordant"),
        F.expr(
            "CAST(FLOOR(1000000.0 * (conc - disc) / "
            "SQRT(CAST(conc + disc + tx AS DOUBLE) * "
            "CAST(conc + disc + ty AS DOUBLE))) AS BIGINT)"
        ).alias("tau_b_e6"),
    )


def gini_gain(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    scale: int = 1_000_000,
) -> DataFrame:
    """Gini-impurity feature ranking — the decision-tree split
    criterion as a feature-importance report: for each candidate
    feature, the impurity drop ``Gini(root) − Σ_v (n_v/n)·Gini(v)``.

    Gini (unlike entropy) is RATIONAL in the counts, so the whole
    computation stays in exact integer arithmetic — no ``ln`` whose
    last-ulp could differ across engines.  Quantization contract
    (identical-by-construction on both engines): each value's purity
    term is ``floor(scale·Σ_c n_vc² / n_v)`` and the weighted sum
    floor-divides by ``n`` once more; root purity is
    ``floor(scale·Σ_c n_c² / n²)`` in 38-digit decimals.

    Scale shape: one melt (``stack``) pass over the fact table, one
    groupBy on (feature, value, label) — cardinality bounded by the
    value domains, not rows — then two bounded reductions.  Features
    with high-cardinality values should be bucketed upstream (as any
    tree library requires).

    Output: one row per feature — (feature, n_values, gini_root_e6,
    gini_split_e6, gain_e6), descending gain.
    """
    k = len(feature_cols)
    stack_expr = "stack({}, {}) as (feature, value)".format(
        k,
        ", ".join(
            f"'{c}', CAST(`{c}` AS STRING)" for c in feature_cols
        ),
    )
    melted = df.select(
        F.col(label_col).alias("_label"), F.expr(stack_expr)
    )
    vc = (
        melted.groupBy("feature", "value", "_label")
        .agg(F.count(F.lit(1)).alias("nvc"))
    )
    # nvc² and scale·sumsq in 38-digit decimals, matching the root-
    # purity path: BIGINT would wrap silently (Java overflow, non-ANSI)
    # once a (feature, value) bucket exceeds ~3e6 rows.
    per_value = vc.groupBy("feature", "value").agg(
        F.sum(
            F.expr("CAST(nvc AS DECIMAL(38,0)) * nvc")
        ).alias("sumsq"),
        F.sum("nvc").alias("nv"),
    )
    per_feature = per_value.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum(
            F.expr(
                f"(CAST({scale} AS DECIMAL(38,0)) * sumsq) div nv"
            )
        ).alias("s"),
        F.sum("nv").alias("n"),
    )
    root = (
        df.groupBy(F.col(label_col).alias("_label"))
        .agg(F.count(F.lit(1)).alias("nc"))
        .agg(
            F.sum(F.expr("CAST(nc AS DECIMAL(38,0)) * nc")).alias("sq"),
            F.sum("nc").alias("n_root"),
        )
        .select(
            F.expr(
                f"CAST({scale} - (CAST({scale} AS DECIMAL(38,0)) * sq)"
                " div (CAST(n_root AS DECIMAL(38,0)) * n_root)"
                " AS BIGINT)"
            ).alias("gini_root_e6")
        )
    )
    return (
        per_feature.crossJoin(F.broadcast(root))
        .select(
            "feature",
            "n_values",
            "gini_root_e6",
            (F.lit(scale) - F.expr("s div n"))
            .cast("long")
            .alias("gini_split_e6"),
            (
                F.expr("s div n")
                - (F.lit(scale) - F.col("gini_root_e6"))
            )
            .cast("long")
            .alias("gain_e6"),
        )
        .orderBy(F.desc("gain_e6"), "feature")
    )


def mahalanobis_outliers(
    df: DataFrame,
    col_x: str,
    col_y: str,
    threshold_e3: int = 13_816,
    auto_rescale: bool = True,
) -> DataFrame:
    """Bivariate Mahalanobis outlier screen — the correlation-aware
    upgrade of the marginal z-score/IQR/MAD family: a point can sit
    inside both 1-D ranges yet be wildly off the joint ellipse, and
    only the covariance-scaled distance catches it.

    Exact integer algebra end to end: with n-scaled residuals
    ``u = n·x − Sx`` and the unnormalized covariance entries
    ``Cxx = n·Sxx − Sx²`` (etc.), the squared distance is EXACTLY
    ``d² = (Cyy·u² − 2·Cxy·u·v + Cxx·v²) / det(C)`` — no means, no
    float covariance inverse — emitted as ``floor(1000·q / det)``.
    Inputs must be integer columns pre-scaled so the 38-digit decimal
    budget holds: with ``C ≈ n²·V²`` and ``|u| ≤ n·V`` the largest
    term is ``1000·C·u² ≈ 1000·n⁴·V⁴``, so the safe range is
    ``n·max|value| ≲ 5e8`` (e.g. 1e7 rows at |value| ≤ 50, or 1e5
    rows at |value| ≤ 5e3 — NOT 1e4 at 1e7 rows, which overflows).
    The bound is ENFORCED, not assumed: the moments pass also folds
    min/max, and the driver computes the exact worst-case term sum in
    arbitrary-precision ints from (C, n·min−S, n·max−S); if it would
    exceed the 38-digit cap the call raises with the required rescale
    factor instead of letting non-ANSI decimal overflow null the
    scores out (nulls are excluded from aggregates, which would
    silently report 0 outliers on big data while small tests pass).
    Default threshold = χ²(2) at 99.9% (13.816).

    Plan: ONE moments aggregate (map-side combined) broadcast back
    over the scan — two passes over data, zero shuffles of raw rows.
    Degenerate covariance (det ≤ 0: constant or collinear columns)
    raises.

    Output: one row — (n, n_outliers, max_d2_e3, sum_d2_e3).
    """
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(col_x).cast(d38).alias("x"),
        F.col(col_y).cast(d38).alias("y"),
    )
    m = base.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.min("x").alias("mnx"),
        F.max("x").alias("mxx"),
        F.min("y").alias("mny"),
        F.max("y").alias("mxy_"),
    ).select(
        "n", "sx", "sy", "mnx", "mxx", "mny", "mxy_",
        F.expr("n * sxx - sx * sx").alias("cxx"),
        F.expr("n * sxy - sx * sy").alias("cxy"),
        F.expr("n * syy - sy * sy").alias("cyy"),
    )
    row = m.collect()[0]
    if row["n"] == 0:
        # Empty input: covariance is undefined — same degenerate
        # contract as det <= 0 below (raise, never a NULL score pass).
        raise ValueError("degenerate covariance (empty input)")
    det = int(row["cxx"]) * int(row["cyy"]) - int(row["cxy"]) ** 2
    if det <= 0:
        raise ValueError(
            "degenerate covariance (constant or collinear columns)"
        )
    # Exact decimal-budget validation (arbitrary-precision ints): the
    # per-row expression's largest value is 1000·(Cyy·u² + 2|Cxy||u||v|
    # + Cxx·v²) at the extreme residuals.  Non-ANSI decimal overflow
    # would NULL the score (silently dropping rows from n_outliers /
    # max / sum), so refuse up front with the needed rescale factor.
    n_i = int(row["n"])
    bx = max(
        abs(n_i * int(row["mnx"]) - int(row["sx"])),
        abs(n_i * int(row["mxx"]) - int(row["sx"])),
    )
    by = max(
        abs(n_i * int(row["mny"]) - int(row["sy"])),
        abs(n_i * int(row["mxy_"]) - int(row["sy"])),
    )
    worst = 1000 * (
        int(row["cyy"]) * bx * bx
        + 2 * abs(int(row["cxy"])) * bx * by
        + int(row["cxx"]) * by * by
    )
    budget = 10**38 - 1
    if worst > budget:
        # each factor-of-10 input downscale shrinks `worst` by 1e4
        import math

        rescale = 10 ** math.ceil(math.log10(worst / budget) / 4)
        if auto_rescale:
            # Scale gate (round 11): Mahalanobis distance is invariant
            # under linear input scaling (μ and Σ rescale with the
            # data, d² cancels exactly in real arithmetic), so the
            # over-budget call re-runs on inputs integer-divided by
            # the computed factor — the result differs from the
            # un-scalable exact form only by the floor-quantization of
            # the inputs (sub-`rescale` structure).  Below the budget
            # — every driver-run oracle scale — this branch never
            # engages and results are bit-identical.  Recursion
            # terminates: rescale ≥ 10 shrinks `worst` by ≥ 1e4 per
            # level.  The loud ValueError remains the contract under
            # auto_rescale=False.
            scaled = df.select(
                F.expr(
                    f"CAST({col_x} AS decimal(38,0)) div {rescale}"
                ).alias(col_x),
                F.expr(
                    f"CAST({col_y} AS decimal(38,0)) div {rescale}"
                ).alias(col_y),
            )
            return mahalanobis_outliers(
                scaled, col_x, col_y, threshold_e3, auto_rescale=True
            )
        raise ValueError(
            "mahalanobis_outliers: decimal(38,0) budget exceeded "
            f"(worst-case term {worst:.3e} > 1e38); pre-divide both "
            f"input columns by ~{rescale} and rerun"
        )
    m = m.drop("mnx", "mxx", "mny", "mxy_")
    scored = base.crossJoin(F.broadcast(m)).select(
        F.expr(
            "(1000 * (cyy * (n * x - sx) * (n * x - sx)"
            " - 2 * cxy * (n * x - sx) * (n * y - sy)"
            " + cxx * (n * y - sy) * (n * y - sy)))"
            " div (cxx * cyy - cxy * cxy)"
        )
        .cast("long")
        .alias("d2_e3")
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("d2_e3") > threshold_e3, 1).otherwise(0)
        ).alias("n_outliers"),
        F.max("d2_e3").alias("max_d2_e3"),
        F.sum("d2_e3").alias("sum_d2_e3"),
    )


def join_skew_report(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top: int = 5,
) -> DataFrame:
    """Pre-join SKEW diagnostic — the planning pass a 100 TB join
    deserves before it runs: exact output cardinality and the keys
    that dominate it, computed WITHOUT executing the join.

    Both sides reduce to (key, count) tables (two partial-agged
    COUNT-GROUP-BYs — shuffle volume is distinct keys, never rows),
    the count tables join on the key (inner: keys on one side only
    contribute 0 output rows), and each key's output contribution is
    ``n_left·n_right``.  Returns the ``top`` keys by contribution
    with their permille share of the exact total — if the top key
    carries 300‰ of a trillion-row join output, that is the key to
    salt (operators/joins.salted_join) or AQE-skew-split BEFORE
    burning a cluster-day discovering it.

    Output: (key, n_left, n_right, contrib, total_rows, n_join_keys,
    permille) — one row per hot key, total/keys repeated for a
    single-pass read."""
    lc = left.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = right.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    contrib = lc.join(rc, "k").select(
        "k", "n_left", "n_right",
        (F.col("n_left") * F.col("n_right")).alias("contrib"),
    )
    totals = contrib.agg(
        F.sum("contrib").alias("total_rows"),
        F.count(F.lit(1)).alias("n_join_keys"),
    )
    ranked = (
        contrib.orderBy(
            F.col("contrib").desc(), F.col("k").asc()
        )
        .limit(top)
        .crossJoin(F.broadcast(totals))
    )
    return ranked.select(
        F.col("k").alias(key),
        "n_left", "n_right", "contrib", "total_rows", "n_join_keys",
        F.expr("contrib * 1000 div total_rows").alias("permille"),
    )


def fd_check(
    df: DataFrame,
    deps: Sequence[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency audit: for each candidate FD ``lhs →
    rhs``, does every lhs value map to exactly one rhs value?  The
    schema-discovery / key-inference primitive of data profiling.
    Columns must be NON-NULL: multi-argument COUNT DISTINCT drops
    rows with a NULL in either column (Spark semantics), silently
    shrinking the pair count — COALESCE sentinel values upstream
    when auditing nullable columns.

        n_violating_lhs = |distinct (lhs, rhs)| − |distinct lhs|

    is 0 iff the FD holds (each extra pair is an lhs bound to a
    second rhs).  Output: one row per candidate — (lhs, rhs, n_lhs,
    n_pairs, n_violations, holds).

    Scale shape: ALL candidates share ONE multi-COUNT-DISTINCT
    aggregation (Spark's Expand two-phase distinct — the
    profile_table pattern), so raw rows are scanned exactly once for
    any number of candidates; the per-candidate rows unpivot from the
    single 1-row result with ONE inline() of a struct array (a union
    of per-candidate selects would re-plan — and re-scan — the full
    aggregation once per candidate; ADVICE r11).
    """
    aggs = []
    for i, (lhs, rhs) in enumerate(deps):
        aggs.append(F.count_distinct(F.col(lhs)).alias(f"_l{i}"))
        aggs.append(
            F.count_distinct(F.col(lhs), F.col(rhs)).alias(f"_p{i}")
        )
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.col(f"_l{i}").cast("long").alias("n_lhs"),
            F.col(f"_p{i}").cast("long").alias("n_pairs"),
            (F.col(f"_p{i}") - F.col(f"_l{i}"))
            .cast("long")
            .alias("n_violations"),
            (F.col(f"_p{i}") == F.col(f"_l{i}")).alias("holds"),
        )
        for i, (lhs, rhs) in enumerate(deps)
    ])
    return one.select(F.inline(rows))
