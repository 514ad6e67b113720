"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are implemented as compositions of existing DataFrame ops (no UDFs,
no custom Catalyst rules), in the shapes that survive 100 TB:

- ``asof_join``: union-and-window.  Tag both sides, union, sort per key
  by event time, and carry the last-seen right-side row forward with
  ``last(ignorenulls)``.  ONE shuffle on the key (the window), zero
  per-row lookups — the classic distributed as-of shape.  A naive
  implementation (per-left-row max-ts subquery) is a quadratic
  correlated join.
- ``range_join``: time-bucket blocking.  With a window of width W, a
  right row can only match left rows in its own or the next W-bucket,
  so exploding the left side to its two candidate buckets turns the
  interval predicate into an EQUI-join plus a residual filter — the
  same blocking idea as the geo grid join (plans/pipelines.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] = (),
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the most recent
    right row with ``right.ts <= left.ts`` per ``by`` key (ties at equal
    timestamps match).  Output: every left column, plus
    ``asof_ts_us`` (matched right timestamp as unix micros, null when
    none) and each requested ``right_cols`` value as ``asof_<name>``.

    ``tolerance_us`` nulls matches older than the tolerance (the pandas
    ``merge_asof`` contract).
    """
    keys = list(by)
    lcols = [c for c in left.columns]
    rtypes = dict(right.dtypes)
    rrow_type = (
        "struct<_rts: bigint"
        + "".join(f", {c}: {rtypes[c]}" for c in right_cols)
        + ">"
    )
    l_part = left.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    r_part = right.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_part.schema["_lrow"].dataType.simpleString()).alias(
            "_lrow"
        ),
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("_rts"),
            *[F.col(c) for c in right_cols],
        ).alias("_rrow"),
    )
    combined = l_part.unionByName(r_part)
    # Right rows sort BEFORE left rows at equal ts (_is_left ascending),
    # so an equal-timestamp right row is visible to the left row.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = combined.select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_match")
    ).filter(F.col("_is_left") == 1)
    match_col: Column = F.col("_match")
    if tolerance_us is not None:
        in_tol = F.col("_match._rts") >= (
            F.unix_micros(F.col("_ts")) - F.lit(tolerance_us)
        )
        match_col = F.when(in_tol, match_col)
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in lcols]
    out_cols.append(match_col["_rts"].alias("asof_ts_us"))
    out_cols.extend(match_col[c].alias(f"asof_{c}") for c in right_cols)
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str = "ts",
    lower_us: int = -600_000_000,
    upper_us: int = 0,
) -> DataFrame:
    """Interval join (inner): pair each left row with every right row
    whose timestamp lies in ``[left.ts + lower_us, left.ts + upper_us]``
    per ``by`` key.  Right non-key columns come back prefixed ``r_``,
    plus the matched timestamp as ``r_ts_us``.  For left semantics
    (zeros for unmatched rows), aggregate the pairs and left-join the
    result back onto ``left`` — cheaper than dragging null rows through
    the blocking join.

    Blocking: bucket width W = upper-lower; a matching right row can
    only sit in the left row's base bucket or the next one, so exploding
    the left side to those two buckets turns the interval predicate into
    an EQUI-join on (key, bucket) plus a residual BETWEEN filter — never
    a per-key cross product.  Same idea as the geo grid join.
    """
    keys = list(by)
    width = upper_us - lower_us
    if width <= 0:
        raise ValueError("upper_us must exceed lower_us")
    l_us = F.unix_micros(F.col(ts_col))
    base_bucket = F.floor((l_us + F.lit(lower_us)) / F.lit(width))
    l_exp = left.select(
        "*",
        l_us.alias("_lus"),
        F.explode(F.array(base_bucket, base_bucket + 1)).alias("_lbucket"),
    )
    r_us = F.unix_micros(F.col(ts_col))
    r_pref = right.select(
        *[F.col(k).alias(f"_rk_{k}") for k in keys],
        F.floor(r_us / F.lit(width)).alias("_bucket"),
        r_us.alias("r_ts_us"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in keys and c != ts_col
        ],
    )
    cond = F.col("_lbucket") == F.col("_bucket")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_rk_{k}"))
    cond = cond & F.col("r_ts_us").between(
        F.col("_lus") + F.lit(lower_us), F.col("_lus") + F.lit(upper_us)
    )
    joined = l_exp.join(r_pref, on=cond, how="inner")
    return joined.drop("_lus", "_lbucket", "_bucket", *[f"_rk_{k}" for k in keys])


def resample_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    step: str = "1 hour",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Regularize an irregular time series: one row per ``step`` per key
    from the key's first to last observation, gaps forward-filled with
    the most recent value (last-observation-carried-forward).

    Plan (all distributed, no driver loop):
    1. bucket each observation to its step start and keep the LAST
       value per (key, bucket) — one aggregation;
    2. build each key's dense spine with ``sequence(min, max, step)``
       + ``explode`` — row count is (span/step), generated executor-side;
    3. left-join observations onto the spine (one shuffle on
       (key, bucket)) and carry values forward with
       ``last(ignorenulls)`` over the per-key time window.

    Forward-filled values are exact copies of observed values (no
    interpolation), so results are engine-portable bit-for-bit.
    Memory: the window needs no full-partition buffer (running last),
    and each key's spine rows live on one partition only if you window
    by key — which step 3 does; skew = one key with a huge time span,
    bounded by span/step rows.
    """
    keys = list(key_cols)
    vals = list(value_cols)
    units = {"1 minute": "minute", "1 hour": "hour", "1 day": "day"}
    if step not in units:
        raise ValueError(f"step must be one of {sorted(units)}")
    bucket = F.date_trunc(units[step], F.col(ts_col))
    # Last observation per (key, bucket): max-ts row wins;
    # ``tiebreak_cols`` (e.g. a unique id) make equal-ts picks
    # deterministic and engine-portable.
    w_rank = Window.partitionBy(*keys, "_bucket").orderBy(
        F.desc(ts_col), *[F.desc(c) for c in tiebreak_cols]
    )
    obs = (
        df.select(*keys, F.col(ts_col), *vals, *tiebreak_cols)
        .withColumn("_bucket", bucket)
        .withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") == 1)
        .drop("_rn", ts_col, *tiebreak_cols)
    )
    spine = (
        obs.groupBy(*keys)
        .agg(
            F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi")
        )
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}")
                )
            ).alias("_bucket"),
        )
    )
    joined = spine.join(obs, on=[*keys, "_bucket"], how="left")
    w_fill = (
        Window.partitionBy(*keys)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        *keys,
        F.col("_bucket").alias("bucket_ts"),
        *[
            F.last(F.col(v), ignorenulls=True).over(w_fill).alias(v)
            for v in vals
        ],
    )
    return filled


def resample_interp(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Regularize an irregular integer-valued series with LINEAR
    interpolation — the numeric-gap counterpart of
    :func:`resample_ffill`'s LOCF: an unobserved spine bucket between
    observations (t₀,v₀) and (t₁,v₁) gets
    ``floor(v₀ + (v₁−v₀)·(t−t₀)/(t₁−t₀))``.

    Exactness contract: the interpolation ratio is evaluated in
    double and floored — every term is an exact integer below 2^53
    (micros values ×  gap seconds ≈ 1e14 at day-scale gaps), and both
    engines run the identical IEEE expression, so results hash-match.
    Integer ``DIV`` is deliberately NOT used: the numerator can be
    negative (falling series) and Spark's div truncates where the
    oracle's ``//`` floors.

    Spine buckets run from each key's first to last observation, so
    every unobserved bucket has BOTH neighbors — no edge
    extrapolation.  Returns (keys..., bucket_ts, value, observed).

    Plan: one per-(key, bucket) last-observation aggregate, an
    executor-side sequence+explode spine, one (key, bucket) join, and
    ONE per-key window sort shared by the running-last and
    running-first neighbor folds."""
    keys = list(key_cols)
    units = {"1 minute": "minute", "1 hour": "hour", "1 day": "day"}
    if step not in units:
        raise ValueError(f"step must be one of {sorted(units)}")
    bucket = F.date_trunc(units[step], F.col(ts_col))
    w_rank = Window.partitionBy(*keys, "_bucket").orderBy(
        F.desc(ts_col), *[F.desc(c) for c in tiebreak_cols]
    )
    obs = (
        df.select(*keys, F.col(ts_col), value_col, *tiebreak_cols)
        .withColumn("_bucket", bucket)
        .withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") == 1)
        .select(*keys, "_bucket", F.col(value_col).alias("_v"))
    )
    spine = (
        obs.groupBy(*keys)
        .agg(F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}")
                )
            ).alias("_bucket"),
        )
    )
    joined = spine.join(obs, on=[*keys, "_bucket"], how="left").withColumn(
        "_t", F.unix_timestamp(F.col("_bucket"))
    )
    pt = F.struct(F.col("_t").alias("t"), F.col("_v").alias("v"))
    marked = F.when(F.col("_v").isNotNull(), pt)
    w_back = (
        Window.partitionBy(*keys)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy("_bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    both = joined.select(
        *keys,
        "_bucket",
        "_v",
        F.last(marked, ignorenulls=True).over(w_back).alias("_p"),
        F.first(marked, ignorenulls=True).over(w_fwd).alias("_n"),
    )
    interp = F.floor(
        F.col("_p.v")
        + (F.col("_n.v") - F.col("_p.v"))
        * (F.col("_t") - F.col("_p.t"))
        / (F.col("_n.t") - F.col("_p.t"))
    ).cast("long")
    return (
        both.withColumn("_t", F.unix_timestamp(F.col("_bucket")))
        .select(
            *keys,
            F.col("_bucket").alias("bucket_ts"),
            F.when(F.col("_v").isNotNull(), F.col("_v"))
            .otherwise(interp)
            .alias(value_col),
            F.col("_v").isNotNull().alias("observed"),
        )
    )


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log: one
    row per (key, change), valid from its own timestamp until the NEXT
    change of the same key (open interval → null valid_to).

    Consecutive rows with identical values are collapsed first (a
    re-stated unchanged value is not a new version — the standard SCD2
    contract), via ``lag`` comparison.  One shuffle (the per-key
    window); both the collapse and the interval assignment ride the
    same sort.
    """
    keys = list(key_cols)
    vals = list(value_cols)
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    val_struct = F.struct(*[F.col(v) for v in vals])
    changed = F.lag(val_struct).over(w).isNull() | (
        F.lag(val_struct).over(w) != val_struct
    )
    versions = df.select(*keys, F.col(ts_col), *vals, *tiebreak_cols).withColumn(
        "_chg", changed
    ).filter(F.col("_chg")).drop("_chg")
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return versions.select(
        *keys,
        *vals,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    )


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    key_col: str,
) -> DataFrame:
    """Peak-concurrency profile per key over half-open intervals
    ``[start, end)`` — the classic sweep-line reduced to ONE window:
    sessions online at once, GPU jobs in flight, connections held.

    Each interval emits (+1 at start, −1 at end); the per-key running
    sum ordered by ``(t, delta)`` is the concurrency curve.  The
    default RANGE window frame makes tie groups atomic (every row in an
    equal-(t, delta) group sees the group-end running sum), and −1
    sorts before +1, so a close and an open at the same instant never
    overlap — both properties make the curve, its max, and the first
    time the max is reached deterministic regardless of row order.

    Returns (key, max_concurrent, first_peak) with first_peak the
    earliest ``t`` at which the max is attained.

    Scale shape: the explode doubles the row count map-side; ONE
    shuffle keyed on ``key`` feeds a sort-based window, and the final
    per-key agg reuses the window's partitioning — no second exchange.
    Skewed keys (one tenant with billions of sessions) are inherent to
    the semantics; pre-split by time range and merge curve maxima if a
    single key outgrows a partition.
    """
    events = df.select(
        F.col(key_col),
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("t"), F.lit(1).alias("d")
                ),
                F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("_e"),
    ).select(key_col, F.col("_e.t").alias("t"), F.col("_e.d").alias("d"))
    w = Window.partitionBy(key_col).orderBy("t", "d")
    run = events.select(
        F.col(key_col),
        F.col("t"),
        F.sum("d").over(w).cast("long").alias("_run"),
    )
    peak = Window.partitionBy(key_col)
    return (
        run.withColumn("_max", F.max("_run").over(peak))
        .filter(F.col("_run") == F.col("_max"))
        .groupBy(key_col)
        .agg(
            F.max("_max").alias("max_concurrent"),
            F.min("t").alias("first_peak"),
        )
    )


def seasonality_profile(
    df: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """Weekly seasonality heat-map: event counts per (day-of-week,
    hour-of-day) with integer-permille share — the load-shape profile
    behind capacity planning and anomaly baselines.

    Calendar buckets are PURE INTEGER arithmetic on epoch time
    (``dow = (epoch_day + 4) % 7`` with 0 = Sunday — 1970-01-01 was a
    Thursday; ``hour = epoch_us div 3600e6 mod 24``), immune to the
    engines' differing DAYOFWEEK conventions and session time zones
    (UTC by construction).

    One partial-agged hash aggregation; output is ≤ 168 rows no matter
    the input size, plus a window over those 168 for the share.
    """
    day = F.expr(f"unix_micros({ts_col}) div 86400000000")
    out = (
        df.select(
            ((day + 4) % 7).cast("int").alias("dow"),
            F.expr(
                f"CAST(unix_micros({ts_col}) div 3600000000 % 24 AS INT)"
            ).alias("hour"),
        )
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return out.select(
        "dow",
        "hour",
        "n_events",
        F.expr(
            "1000 * n_events div SUM(n_events) OVER ()"
        ).alias("share_permille"),
    )


def time_weighted_avg(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average (TWAP) per group — the metric/finance
    aggregate a plain AVG gets wrong when observations are unevenly
    spaced: each observation's value holds until the NEXT observation
    (step interpolation), so its weight is the interval it was live,
    not 1.  The last observation of a group carries no interval and
    contributes nothing (the standard closed-interval TWAP over the
    observed span).

    Engine-exact: values quantize to integer micros, intervals are
    unix-microsecond deltas, and the average is one integer division
    of DECIMAL(38,0) sums — identical in any engine.  Returns
    (group_cols..., twap_micros, span_us, n_obs); groups with a single
    observation (zero span) are dropped rather than dividing by zero.

    Scale shape: ONE key-keyed window (the lead) and ONE partial-agged
    groupBy riding the same shuffle key — the sessionize cost.  No
    self-joins, no global sort.
    """
    keys = [F.col(c) for c in group_cols]
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(*keys).orderBy(us.asc(), F.col(value_col))
    dt = F.lead(us).over(w) - us
    vm = F.floor(F.col(value_col).cast("double") * 1e6)
    return (
        df.select(*keys, vm.alias("_vm"), dt.alias("_dt"))
        .filter(F.col("_dt").isNotNull())
        .groupBy(*keys)
        .agg(
            F.expr(
                "CAST(SUM(CAST(_vm AS DECIMAL(38,0)) * _dt) "
                "DIV SUM(CAST(_dt AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("twap_micros"),
            F.sum("_dt").cast("long").alias("span_us"),
            (F.count(F.lit(1)) + 1).cast("long").alias("n_obs"),
        )
    )


def ohlc_bars(
    df: DataFrame,
    group_cols: Sequence[str],
    bucket_minutes: int = 60,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """OHLC (open/high/low/close) bars — the candlestick rollup every
    metrics/market store serves: per group and fixed time bucket, the
    first, max, min, and last observed value.  Open/close are
    ``min_by``/``max_by`` on the timestamp (event-id-free tiebreak on
    the value itself for same-instant observations, deterministic),
    high/low plain MIN/MAX — all five aggregates partial-combine in
    ONE groupBy, so a bar table over 100 TB of ticks costs exactly one
    COUNT(*)-GROUP-BY-shaped shuffle.

    Values quantize to integer micros (engine-exact floor).  Returns
    (group_cols..., bucket_start, open/high/low/close_micros, n_obs).
    """
    keys = [F.col(c) for c in group_cols]
    us = F.unix_micros(F.col(ts_col))
    bucket_us = int(bucket_minutes) * 60 * 1_000_000
    bstart = (us - us % bucket_us).alias("bucket_start_us")
    vm = F.floor(F.col(value_col).cast("double") * 1e6)
    # same-instant tiebreak: order by (ts, value) via a packed struct
    key = F.struct(us.alias("_us"), vm.alias("_vm"))
    return (
        df.select(*keys, bstart, vm.alias("_vm"), key.alias("_k"))
        .groupBy(*group_cols, "bucket_start_us")
        .agg(
            F.min_by("_vm", "_k").cast("long").alias("open_micros"),
            F.max("_vm").cast("long").alias("high_micros"),
            F.min("_vm").cast("long").alias("low_micros"),
            F.max_by("_vm", "_k").cast("long").alias("close_micros"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def cusum_shift(
    df: DataFrame,
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """CUSUM level-shift detection over per-bucket event counts — the
    change-point monitor behind "did ingest volume step-change on some
    day?" (Page 1954): the cumulative sum of deviations from the mean
    drifts steadily while the level is stable and kinks sharply at a
    regime change; the bucket where |CUSUM| peaks is the estimated
    shift point.

    Pure integer form (engine-exact, no mean division): with per-bucket
    counts c_i over n buckets and total T = Σc, the deviation cumsum
    scaled by n is ``S_k = Σ_{i≤k} (c_i·n − T)`` — integers only,
    identical on any engine.  Returns one row per bucket:
    (bucket_start_us, n_events, cusum_scaled, is_peak) with ``is_peak``
    marking every bucket attaining max |S_k| (the shift estimate —
    normally one bucket; exact ties all flagged, deterministically).

    Scale shape: the raw scan collapses to ≤ one-row-per-bucket via a
    partial-agged groupBy; the cumulative window then runs over the
    BUCKET table (calendar-bounded — days in a year, not rows in the
    corpus), so the unpartitioned window is cardinality-safe by
    construction, like seasonality_profile's 168-row window.
    """
    us_per = {"day": 86_400_000_000, "hour": 3_600_000_000}[bucket]
    us = F.unix_micros(F.col(ts_col))
    counts = (
        df.select((us - us % us_per).alias("bucket_start_us"))
        .groupBy("bucket_start_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.orderBy("bucket_start_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    scored = counts.select(
        "bucket_start_us",
        "n_events",
        (
            F.sum(F.col("n_events")).over(w)
            * F.count(F.lit(1)).over(tot)
            - (F.row_number().over(Window.orderBy("bucket_start_us")))
            * F.sum(F.col("n_events")).over(tot)
        ).cast("long").alias("cusum_scaled"),
    )
    peak = Window.partitionBy()
    return scored.select(
        "bucket_start_us",
        "n_events",
        "cusum_scaled",
        (
            F.abs(F.col("cusum_scaled"))
            == F.max(F.abs(F.col("cusum_scaled"))).over(peak)
        ).alias("is_peak"),
    )


def acf(
    series: DataFrame,
    t_col: str,
    v_col: str,
    max_lag: int = 14,
) -> DataFrame:
    """Autocorrelation function of a regular series at lags 1..max_lag
    — the periodicity detector behind seasonality discovery (a weekly
    cycle shows as a peak at lag 7) and change-monitoring.

    ``series`` must hold ONE row per integer period index ``t_col``
    with an integer-valued ``v_col`` (pre-aggregate first — at 100 TB
    the raw-to-period rollup is the heavy, map-side-combinable pass;
    this function then runs on the bounded period table).

    Exactness contract (the corr_matrix pattern): all moment sums are
    exact DECIMAL(38,0); the classic estimator

        r_k = sum_{t<=n-k} (x_t - mean)(x_{t+k} - mean)
              / sum_t (x_t - mean)^2

    is cleared of the 1/n mean by multiplying through by n^2:

        r_k = N_k / (n * D),   with
        N_k = n^2*S_xy(k) - n*S*(S_x(k) + S_y(k)) + n_k*S^2
        D   = n*SS - S^2

    so floats appear only in the final ratio of two already-exact
    scalars — deterministic on every engine.  Output: (lag, n_pairs,
    acf_e6) with acf_e6 = floor(1e6 * r_k).

    Scale shape: the lag fan-out explodes max_lag rows per period and
    equi-joins the series to itself on the shifted index — shuffle
    volume max_lag * |periods|, never touching raw rows.
    """
    d38 = "decimal(38,0)"
    v = F.col(v_col).cast(d38)
    base = series.select(
        F.col(t_col).cast("long").alias("t"), v.alias("x")
    )
    moments = base.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    lags = F.array(*[F.lit(k) for k in range(1, max_lag + 1)])
    left = base.select(
        "t", F.col("x").alias("x_t"), F.explode(lags).alias("lag")
    ).withColumn("t_pair", F.col("t") + F.col("lag"))
    right = base.select(
        F.col("t").alias("t_pair"), F.col("x").alias("x_tk")
    )
    per_lag = (
        left.join(right, "t_pair")
        .groupBy("lag")
        .agg(
            F.count("*").cast(d38).alias("n_k"),
            F.sum(F.col("x_t") * F.col("x_tk")).alias("sxy"),
            F.sum("x_t").alias("sx"),
            F.sum("x_tk").alias("sy"),
        )
    )
    j = per_lag.crossJoin(F.broadcast(moments))
    num = (
        F.col("n") * F.col("n") * F.col("sxy")
        - F.col("n") * F.col("s") * (F.col("sx") + F.col("sy"))
        + F.col("n_k") * F.col("s") * F.col("s")
    )
    den = F.col("n") * (
        F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    )
    return j.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n_k").cast("long").alias("n_pairs"),
        F.when(
            den > 0,
            F.floor(
                F.lit(1000000.0)
                * num.cast("double")
                / den.cast("double")
            ),
        )
        .cast("long")
        .alias("acf_e6"),
    ).orderBy("lag")


def theil_sen_slope(
    series: DataFrame,
    t_col: str,
    v_col: str,
) -> DataFrame:
    """Theil-Sen robust trend: the median of all pairwise slopes
    (v_j - v_i) / (t_j - t_i), i < j — the estimator that shrugs off
    ~29% outlier contamination where least squares folds at one bad
    point.

    Like :func:`acf`, this runs on a PRE-AGGREGATED period series
    (one row per integer period): the pair set is |periods|²/2, which
    is bounded by the calendar, not the corpus — the 100 TB-heavy
    raw-to-period rollup happens upstream as a map-side-combinable
    aggregation.  The small series side is broadcast, so the pair
    generation is a BroadcastNestedLoopJoin, never a shuffled
    cartesian.

    Exactness contract: each pair slope is floored to integer
    permille (FLOOR(1000.0 * dv / dt), IEEE-identical on any engine),
    and the median of an even count takes the LOWER middle — so the
    output is a single deterministic integer, not an engine-dependent
    float average.  Output: one row (n_periods, n_pairs,
    slope_permille).
    """
    a = series.select(
        F.col(t_col).cast("long").alias("t1"),
        F.col(v_col).cast("long").alias("v1"),
    )
    b = series.select(
        F.col(t_col).cast("long").alias("t2"),
        F.col(v_col).cast("long").alias("v2"),
    )
    pairs = a.join(F.broadcast(b), F.col("t2") > F.col("t1")).select(
        F.floor(
            F.lit(1000.0)
            * (F.col("v2") - F.col("v1")).cast("double")
            / (F.col("t2") - F.col("t1")).cast("double")
        ).alias("slope_pm")
    )
    ranked = pairs.select(
        "slope_pm",
        F.row_number()
        .over(Window.orderBy("slope_pm"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("m"),
    )
    n_row = series.agg(F.count("*").cast("long").alias("n_periods"))
    return (
        ranked.filter(F.col("rn") == F.floor((F.col("m") + 1) / 2))
        .crossJoin(F.broadcast(n_row))
        .select(
            "n_periods",
            F.col("m").cast("long").alias("n_pairs"),
            F.col("slope_pm").cast("long").alias("slope_permille"),
        )
    )


def holt_smoothing(
    daily: DataFrame,
    t_col: str,
    x_col: str,
    alpha_permille: int = 200,
    beta_permille: int = 100,
    horizon: int = 7,
) -> DataFrame:
    """Holt's double exponential smoothing (level + trend) — the
    workhorse short-range forecaster one step up from the single-EMA
    ``forecast_revenue`` shape.

    The recurrence is inherently sequential, so the scalable split is
    the same as :func:`acf`: raw rows roll up to the BOUNDED series
    upstream (daily/hourly keys), and the recurrence folds over that
    bounded series inside ONE JVM ``aggregate`` expression on a
    sorted ``collect_list`` — no Python, no window over raw rows, and
    the folded array is |days|, not |rows|.

    Exact integer fixed point (both engines replay it step for step):
      level' = (α·x + (1000−α)·(level + trend)) div 1000
      trend' = (β·(level' − level) + (1000−β)·trend) div 1000
    seeded level = first x, trend = 0.  ``div`` floors (Spark `div`
    on BIGINT; the oracle uses the explicit floor formula), and a
    ``checksum`` column sums every intermediate level so the FULL
    trajectory is verified, not just the endpoint.

    Output: one row — (n_periods, level, trend,
    forecast_h = level + horizon·trend, level_checksum).
    """
    a, b = alpha_permille, beta_permille
    series = daily.select(
        F.col(t_col).cast("long").alias("_t"),
        F.col(x_col).cast("long").alias("_x"),
    )
    # Constant-key GROUPED aggregate, not a global agg: a grouped agg
    # emits NO row on empty input, so an empty partition-pruned slice
    # yields an empty forecast (rows iff data) instead of a fabricated
    # all-NULL row — matching the oracle's recursive CTE, which seeds
    # from `WHERE i = 1` and produces nothing on an empty series.
    folded = series.groupBy(F.lit(1).alias("_g")).agg(
        F.expr(
            f"""
            aggregate(
              transform(
                array_sort(collect_list(struct(_t, _x))), p -> p._x),
              named_struct(
                'n', CAST(0 AS BIGINT), 's', CAST(0 AS BIGINT),
                'b', CAST(0 AS BIGINT), 'ck', CAST(0 AS BIGINT)),
              (acc, x) -> IF(
                acc.n = 0,
                named_struct('n', CAST(1 AS BIGINT), 's', x,
                             'b', CAST(0 AS BIGINT), 'ck', x),
                named_struct(
                  'n', acc.n + 1,
                  's', ({a} * x + {1000 - a} * (acc.s + acc.b)) div 1000,
                  'b', ({b} * ((({a} * x + {1000 - a} * (acc.s + acc.b))
                               div 1000) - acc.s)
                        + {1000 - b} * acc.b) div 1000,
                  'ck', acc.ck
                    + ({a} * x + {1000 - a} * (acc.s + acc.b)) div 1000)),
              acc -> acc)
            """
        ).alias("r")
    )
    return folded.select(
        F.col("r.n").alias("n_periods"),
        F.col("r.s").alias("level"),
        F.col("r.b").alias("trend"),
        (F.col("r.s") + horizon * F.col("r.b")).alias(
            f"forecast_{horizon}"
        ),
        F.col("r.ck").alias("level_checksum"),
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Gaps-and-islands: merge overlapping/touching intervals per key
    into maximal covered runs — the dual of
    :func:`interval_concurrency` (that one counts simultaneous
    intervals; this one collapses them), used for billable-uptime,
    coverage, and availability reports.

    Classic two-window shape, ONE shuffle on the key: order intervals
    by (start, tiebreak), carry the running maximum end (ROWS frame —
    a RANGE frame would merge tied starts prematurely), open a new
    island where a start exceeds every previous end, number islands
    with a running sum of the open flags, then aggregate per island.
    Integer microsecond arithmetic throughout.

    Output: (key, island_id, island_start_us, island_end_us,
    n_intervals, covered_us) — ``covered_us`` is end − start of the
    merged island, NOT the sum of member lengths (overlap collapses).
    """
    w = Window.partitionBy(key_col).orderBy(start_col, tiebreak_col)
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end),
        F.lit(1),
    ).otherwise(F.lit(0))
    tagged = df.select(
        F.col(key_col).alias("key"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
        opens.alias("_open"),
        F.col(tiebreak_col).alias("_tb"),
    ).select(
        "key",
        "s",
        "e",
        F.sum("_open")
        .over(
            Window.partitionBy("key")
            .orderBy("s", "_tb")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("island_id"),
    )
    return tagged.groupBy("key", "island_id").agg(
        F.min("s").alias("island_start_us"),
        F.max("e").alias("island_end_us"),
        F.count(F.lit(1)).alias("n_intervals"),
        (F.max("e") - F.min("s")).alias("covered_us"),
    )


def lag_features(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    lags: Sequence[int] = (1, 7),
    roll_days: int = 7,
) -> DataFrame:
    """Forecasting feature matrix over a (key, day, value) series:
    per row add ``lag_{n}`` columns (value ``n`` DAYS earlier — a
    RANGE-offset lookup, so gap days yield NULL rather than the
    previous ROW's value, the classic lag-feature bug) and
    ``roll_sum``/``roll_n`` over the trailing ``roll_days``-day
    window EXCLUDING the current day (features must be computable
    before the label's day closes — no target leakage).

    Scale shape: one Exchange on ``key_col``; every lag and the
    rolling window share that single sort (Spark fuses same-spec
    windows), and windows are RANGE-bounded over integer day
    offsets so per-row state is the sliding aggregate, never a
    buffered partition."""
    days = F.datediff(F.col(day_col), F.lit("1970-01-01"))
    base = df.withColumn("_d", days)
    w_ordered = Window.partitionBy(key_col).orderBy("_d")
    out = base
    for n in lags:
        w_lag = w_ordered.rangeBetween(-n, -n)
        out = out.withColumn(f"lag_{n}", F.max(value_col).over(w_lag))
    w_roll = w_ordered.rangeBetween(-roll_days, -1)
    out = out.withColumn(
        "roll_sum", F.sum(value_col).over(w_roll)
    ).withColumn("roll_n", F.count(value_col).over(w_roll))
    return out.drop("_d")


def seasonal_naive_mase(
    df: DataFrame,
    t_col: str,
    value_col: str,
    season: int = 7,
) -> DataFrame:
    """MASE evaluation of the seasonal-naive forecast (Hyndman &
    Koehler 2006) over a regular integer-time series: how much better
    does "same as one season ago" predict than "same as yesterday"?

        mase_permille = 1000 · Σ|y_t − y_{t−season}| ·  n₁
                        ─────────────────────────────────────
                        Σ|y_t − y_{t−1}| · n_s

    (each sum over the timestamps where its lag exists; n₁/n_s are the
    respective term counts, so both means are exact rationals and the
    ratio is computed in one integer division).  < 1000 means the
    seasonal pattern is real — the go/no-go gate before fitting
    anything fancier (holt_forecast, seasonality) on a 100 TB event
    stream's rollups.

    Returns one row: (n_points, n_seasonal_terms, n_naive_terms,
    mase_permille).  Input must already be rolled up to the bounded
    series (days, hours) — the lag windows here order a |series|-sized
    table, never raw events.
    """
    w = Window.orderBy(t_col)
    lagged = df.select(
        F.col(t_col).alias("_t"),
        F.col(value_col).alias("_y"),
        F.lag(value_col, 1).over(w).alias("_y1"),
        F.lag(value_col, season).over(w).alias("_ys"),
    )
    return lagged.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.count("_ys").alias("n_seasonal_terms"),
        F.count("_y1").alias("n_naive_terms"),
        F.expr(
            "1000 * sum(abs(_y - _ys)) * count(_y1) "
            "div (sum(abs(_y - _y1)) * count(_ys))"
        ).alias("mase_permille"),
    )


def lateness_profile(
    df: DataFrame,
    ts_col: str,
    order_col: str | list[str],
    key_col: str,
) -> DataFrame:
    """Empirical out-of-orderness profile — the measurement that picks
    a streaming watermark delay FROM THE DATA instead of folklore: for
    every event, lateness = (running max of event time in ARRIVAL
    order, per key) − its own event time; the distribution's tail is
    exactly the state a watermark of that delay would have dropped.

    Returns one row per power-of-two lateness bucket (seconds):
    (bucket_s = 0, 1, 2, 4, …, n_events, n_keys) — bucket 0 is the
    in-order mass; reading the cumulative tail off this table answers
    "watermark = X loses Y events" for every X at once.

    Scale shape: the running max is a window PARTITIONED BY key in
    arrival order — state O(1) per key, partitions bounded by the key
    domain, never a global ordering of the stream; the bucket rollup
    is a partial-agged groupBy over ≤ ~40 buckets."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = df.select(
        F.col(key_col).alias("_k"),
        (
            F.unix_micros(F.max(ts_col).over(w))
            - F.unix_micros(F.col(ts_col))
        ).alias("_late_us"),
    )
    # integer power-of-two bucket: 2^floor(log2(late_s+1)) computed via
    # binary-string bit length (bin/length), NEVER float log2/pow — a
    # last-ulp log difference at a boundary value would bucket the same
    # event differently across engines
    bucket = F.when(F.col("_late_us") <= 0, F.lit(0)).otherwise(
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), "
            "CAST(length(bin(_late_us div 1000000 + 1)) - 1 AS INT))"
        )
    )
    return (
        late.select("_k", bucket.alias("bucket_s"))
        .groupBy("bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("_k").alias("n_keys"),
        )
    )


def stl_lite(
    df: DataFrame,
    t_col: str,
    value_col: str,
    season: int = 7,
    trend_window: int = 7,
) -> DataFrame:
    """Robust additive decomposition of a regular integer-time series —
    the STL idea (trend + seasonal + residual) with MEDIANS instead of
    loess so every component is an exact integer and the result is
    engine-reproducible:

    - ``trend``   = centered rolling median over ``trend_window`` rows
      (odd window; the first/last half-windows shrink symmetrically);
    - ``seasonal`` = per-phase (t mod season) median of the detrended
      series, re-centered so the seasonal component sums to ~0 (its
      own median is subtracted — the additive-identifiability fix);
    - ``residual`` = value − trend − seasonal.

    Medians are lower-medians (element at ``(n+1) div 2`` of the
    sorted run) so even-sized sets stay integer.  Returns one row per
    input point: (t, value, trend, seasonal, residual).

    Scale shape: the rolling median runs as a windowed
    ``array_sort(collect_list)`` over the BOUNDED series (days/hours —
    the input contract here, as in :func:`seasonal_naive_mase`, is a
    rolled-up series, never raw events); the seasonal medians are a
    ``season``-row aggregate joined back broadcast."""
    if trend_window % 2 != 1 or trend_window < 3:
        raise ValueError("trend_window must be odd and >= 3")
    half = trend_window // 2
    w = Window.orderBy("_t").rowsBetween(-half, half)
    lower_median = (
        "element_at(_arr, CAST((size(_arr) + 1) / 2 AS INT))"
    )
    with_trend = (
        df.select(F.col(t_col).alias("_t"), F.col(value_col).alias("_y"))
        .withColumn("_arr", F.array_sort(F.collect_list("_y").over(w)))
        .selectExpr("_t", "_y", f"{lower_median} AS _trend")
    )
    detr = with_trend.withColumn("_d", F.col("_y") - F.col("_trend"))
    seas = (
        detr.groupBy(F.pmod(F.col("_t"), F.lit(season)).alias("_ph"))
        .agg(F.array_sort(F.collect_list("_d")).alias("_arr"))
        .selectExpr("_ph", f"{lower_median} AS _s_raw")
    )
    center = seas.agg(
        F.array_sort(F.collect_list("_s_raw")).alias("_arr")
    ).selectExpr(f"{lower_median} AS _s_med")
    seas_c = seas.crossJoin(F.broadcast(center)).select(
        "_ph", (F.col("_s_raw") - F.col("_s_med")).alias("_seasonal")
    )
    return (
        detr.join(
            F.broadcast(seas_c),
            F.pmod(F.col("_t"), F.lit(season)) == F.col("_ph"),
        )
        .select(
            F.col("_t").alias(t_col),
            F.col("_y").alias(value_col),
            F.col("_trend").alias("trend"),
            F.col("_seasonal").alias("seasonal"),
            (F.col("_y") - F.col("_trend") - F.col("_seasonal")).alias(
                "residual"
            ),
        )
    )


def gaps_and_islands(
    df: DataFrame,
    key_col: str,
    seq_col: str,
) -> DataFrame:
    """Collapse each key's integer sequence into its maximal runs of
    CONSECUTIVE values ("islands") — the classic gaps-and-islands
    rewrite behind activity-streak, continuous-coverage and
    missing-sequence reports.

    ``seq_col`` must be integer-valued; duplicates within a key are
    collapsed first (a repeated value neither breaks nor extends a
    run).  Output: one row per (key, island) with ``island_start``,
    ``island_end`` and ``island_len`` (the value span, end-start+1).

    Scale shape: ONE exchange on the key — the distinct, the
    ``row_number`` window and the island groupBy all hash-partition
    on ``key_col`` (the window adds a per-key sort, never a global
    one), and the island id is the sequence value minus its per-key
    rank, so consecutive values share a constant difference (the
    Tabibian/Celko trick).  No joins, no self-products; per-key state
    is the sort buffer only.
    """
    w = Window.partitionBy(key_col).orderBy("_v")
    runs = (
        df.select(key_col, F.col(seq_col).cast("long").alias("_v"))
        .distinct()
        .withColumn("_isl", F.col("_v") - F.row_number().over(w))
    )
    return (
        runs.groupBy(key_col, "_isl")
        .agg(
            F.min("_v").alias("island_start"),
            F.max("_v").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .drop("_isl")
    )


def sequence_gaps(
    df: DataFrame,
    key_col: str,
    seq_col: str,
) -> DataFrame:
    """The complement of :func:`gaps_and_islands`: report each key's
    MISSING ranges — for every adjacent island pair, the run of
    absent values strictly between them (the missing-invoice /
    sequence-hole data-quality check).  Keys whose values are fully
    consecutive produce no rows.

    Output: (key, gap_start, gap_end, gap_len).  Scale shape: the
    islands rollup (one exchange on the key) followed by a lead()
    window over the ISLAND table — per-key island counts, not raw
    rows — so the second window sort is bounded by run count.
    """
    islands = gaps_and_islands(df, key_col, seq_col)
    w = Window.partitionBy(key_col).orderBy("island_start")
    nxt = F.lead("island_start").over(w)
    return (
        islands.select(
            key_col,
            "island_end",
            nxt.alias("_next_start"),
        )
        .filter(F.col("_next_start").isNotNull())
        .select(
            key_col,
            (F.col("island_end") + 1).alias("gap_start"),
            (F.col("_next_start") - 1).alias("gap_end"),
            (F.col("_next_start") - F.col("island_end") - 1).alias(
                "gap_len"
            ),
        )
    )


def allen_relations(
    intervals: DataFrame,
    key_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Classify every within-key interval pair into its Allen relation
    (Allen 1983) — the temporal-logic vocabulary behind overlap
    audits, double-booking detection and event-containment reports.
    The 13 relations collapse to 7 by ordering each pair (id_a <
    id_b): before / meets / overlaps / starts / during / finishes /
    equals, where the FIRST-STARTING interval (ties by id) is the
    reference side, so every pair gets exactly one deterministic
    label.

    Intervals are closed [start, end] with start ≤ end.  Output:
    (key, id_a, id_b, relation) for all pairs sharing a key.

    Scale shape: ONE self-equi-join on the key (pairs bounded by the
    per-key interval count — use a bounded grouping key like an order
    id, not a global one) followed by a pure CASE classification at
    scan speed.  For unbounded keys, pre-bucket by time like
    range_join; this operator deliberately keeps the exact per-key
    form for bounded groups.
    """
    a = intervals.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id_a"),
        F.col(start_col).cast("long").alias("s1"),
        F.col(end_col).cast("long").alias("e1"),
    )
    b = intervals.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id_b"),
        F.col(start_col).cast("long").alias("s2"),
        F.col(end_col).cast("long").alias("e2"),
    )
    pairs = a.join(b, on="k").filter(F.col("id_a") < F.col("id_b"))
    # orient: x = the first-starting side (ties by id, which the
    # id_a < id_b filter already fixed), y = the other
    flip = F.col("s2") < F.col("s1")
    xs = F.when(flip, F.col("s2")).otherwise(F.col("s1"))
    xe = F.when(flip, F.col("e2")).otherwise(F.col("e1"))
    ys = F.when(flip, F.col("s1")).otherwise(F.col("s2"))
    ye = F.when(flip, F.col("e1")).otherwise(F.col("e2"))
    rel = (
        F.when((xs == ys) & (xe == ye), "equals")
        .when(xe < ys, "before")
        .when(xe == ys, "meets")
        .when((xs == ys) & (xe < ye), "starts")
        .when((xs < ys) & (ye < xe), "during")      # y inside x
        .when((xs < ys) & (ye == xe), "finishes")   # y finishes x
        .otherwise("overlaps")
    )
    return pairs.select(
        F.col("k").alias(key_col), "id_a", "id_b", rel.alias("relation")
    )


def dyadic_ewma(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    shift: int = 2,
) -> DataFrame:
    """Exponentially-weighted moving average with a DYADIC smoothing
    factor α = 1/2^shift, folded in exact integer arithmetic:

        y₀ = x₀
        yₜ = (xₜ + (2^shift − 1) · yₜ₋₁) ÷ 2^shift    (floor division)

    — the trend-following smoother of monitoring dashboards, with the
    house no-float discipline: because α is dyadic and each step
    floors, the whole recurrence is long arithmetic and replays
    bit-for-bit in any engine (a recursive-CTE oracle runs the same
    fold).  ``value_col`` must be integer-valued (a count or
    pre-quantized micros).

    Scale shape: the recurrence is inherently sequential PER KEY, so
    it folds over the key's ordered series with ONE ``aggregate``
    higher-order function on a ``sort_array(collect_list(...))`` —
    legitimate only because the series is CALENDAR-BOUNDED (one row
    per (key, bucket), e.g. ≤ 8.8k hourly buckets/year), the same
    bounded-table argument as the survival curves.  Raw rows never
    collect: callers pre-aggregate to (key, bucket, value) first, so
    the shuffle is bucket cardinality and each group's array is tiny.

    Returns one row per input row: (key, order, value, ewma).
    """
    if shift < 1 or shift > 30:
        raise ValueError("shift must be in [1, 30]")
    mul = (1 << shift) - 1
    den = 1 << shift
    packed = df.groupBy(F.col(key_col).alias("k")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(order_col).cast("long").alias("o"),
                    F.col(value_col).cast("long").alias("x"),
                )
            )
        ).alias("xs")
    )
    folded = packed.select(
        "k",
        F.expr(
            f"""aggregate(
                 xs,
                 struct(
                   CAST(NULL AS BIGINT) AS prev,
                   CAST(array() AS ARRAY<STRUCT<o: BIGINT, x: BIGINT,
                                               y: BIGINT>>) AS rows
                 ),
                 (acc, e) -> struct(
                   CASE WHEN acc.prev IS NULL THEN e.x
                        ELSE (e.x + {mul}L * acc.prev) div {den}L
                   END AS prev,
                   array_append(acc.rows, struct(
                     e.o AS o, e.x AS x,
                     CASE WHEN acc.prev IS NULL THEN e.x
                          ELSE (e.x + {mul}L * acc.prev) div {den}L
                     END AS y)) AS rows),
                 acc -> acc.rows)"""
        ).alias("rows"),
    )
    return folded.select("k", F.explode("rows").alias("r")).select(
        F.col("k").alias(key_col),
        F.col("r.o").alias(order_col),
        F.col("r.x").alias(value_col),
        F.col("r.y").alias("ewma"),
    )


def cross_correlation(
    series_a: DataFrame,
    series_b: DataFrame,
    order_col: str = "bucket",
    value_col: str = "v",
    max_lag: int = 6,
) -> DataFrame:
    """Lagged cross-correlation between two regular time series — does
    series A lead series B, and by how many buckets?  For each lag
    L ∈ [0, max_lag], the Pearson correlation of pairs
    (a_t, b_{t+L}) over every t both series cover.

    Values must be integer (pre-aggregated counts / micros): all five
    moments per lag are exact DECIMAL(38,0) sums, the correlation is
    the only double (√·√ split, e6-floored in the oracle's expression
    shape).  Lags with < 3 pairs or zero variance report r_e6 = 0.

    Scale shape: a (max_lag+1)-row lag spine broadcast-joins series A
    (bucket+lag precomputed), then ONE hash join against series B on
    the shifted bucket, then ONE per-lag moment aggregation — series
    are calendar-bounded, so the joined volume is lags × buckets.
    Returns (lag, n_pairs, r_e6) ordered by lag.
    """
    d38 = "decimal(38,0)"
    spark = series_a.sparkSession
    lags = spark.range(0, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = series_a.select(
        F.col(order_col).cast("long").alias("t"),
        F.col(value_col).cast(d38).alias("x"),
    )
    b = series_b.select(
        F.col(order_col).cast("long").alias("tb"),
        F.col(value_col).cast(d38).alias("y"),
    )
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("tb", F.col("t") + F.col("lag"))
        .join(b, on="tb")
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return m.select(
        F.col("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        F.expr(
            """CAST(CASE
                 WHEN n < 3 OR (n * sxx - sx * sx) = 0
                      OR (n * syy - sy * sy) = 0 THEN 0
                 ELSE FLOOR(1000000.0 *
                   (CAST(n * sxy - sx * sy AS DOUBLE) /
                    (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) *
                     SQRT(CAST(n * syy - sy * sy AS DOUBLE)))))
               END AS BIGINT)"""
        ).alias("r_e6"),
    ).orderBy("lag")


def sax_transform(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    segment_size: int = 8,
    alphabet: int = 4,
) -> DataFrame:
    """Symbolic Aggregate approXimation (Lin et al. 2003) of a regular
    series — the indexing/motif-discovery reduction that turns a long
    numeric series into a short symbol string: buckets of
    ``segment_size`` consecutive ticks collapse to their mean (PAA),
    and each mean maps to one of ``alphabet`` symbols.

    Engine-exact variant: the PAA mean is an exact e6 long
    (``(1e6·Σv) ÷ n`` per segment — values must be integer), and the
    symbol is EQUI-DEPTH ``NTILE(alphabet)`` over the key's PAA values
    under the total order (paa_e6, segment) — data-driven breakpoints
    instead of the classic Gaussian table, so no float CDF enters and
    both engines replay the same standard NTILE bucketing (first
    ⌈n/k⌉-sized buckets).

    Scale shape: ONE (key, segment) partial agg over the raw series →
    ONE key-partitioned NTILE window over the segment table — which is
    calendar-bounded (series_length ÷ segment_size rows per key), the
    survival-curve argument.  Returns (key, segment, n_ticks, paa_e6,
    symbol) — symbol 1 = lowest band.
    """
    if segment_size < 1 or alphabet < 2:
        raise ValueError("segment_size >= 1 and alphabet >= 2 required")
    seg = df.groupBy(
        F.col(key_col).alias("k"),
        F.expr(f"CAST({order_col} AS BIGINT) div {segment_size}")
        .alias("segment"),
    ).agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.expr(
            f"(1000000 * sum(CAST({value_col} AS BIGINT)))"
            " div count(1)"
        ).alias("paa_e6"),
    )
    w = Window.partitionBy("k").orderBy("paa_e6", "segment")
    return seg.select(
        F.col("k").alias(key_col),
        F.col("segment"),
        F.col("n_ticks").cast("long").alias("n_ticks"),
        F.col("paa_e6").cast("long").alias("paa_e6"),
        F.ntile(alphabet).over(w).cast("long").alias("symbol"),
    )
