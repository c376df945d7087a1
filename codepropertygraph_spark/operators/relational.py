"""Relational operators the reference lacks but a transcript/event analytics
engine needs — currently the AS-OF join (SURVEY.md §2.F names as-of joins as
deliberately absent from the reference; the task brief lists them as the
canonical "operator Spark lacks" to compose from existing DataFrame ops).

Scale shape: Spark has no native as-of join, and the naive formulation
(range-condition join + per-left-row max) explodes to |left| x |right per
key| intermediate rows. The implementation here is the union-and-window
form — one shuffle on (keys, ts), identical scale behavior to
sessionization: tag both sides, union, sort within key by (ts, side) and
carry the last right-side payload forward with ``last(ignorenulls=True)``.
No cross product at any key, skewed keys split by AQE like any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward AS-OF join: each left row gains the LATEST right row with
    ``right.ts <= left.ts`` in the same ``on`` group (ties at equal ts
    match, like DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` — the oracle).
    Unmatched left rows keep NULL right columns (left-join semantics).

    right_cols: right columns to carry (default: everything but keys+ts),
    emitted as ``<col><suffix>`` plus ``<ts><suffix>`` (the matched row's
    timestamp). ``tolerance_us`` bounds the lookback: matches older than
    this many microseconds are discarded (pandas ``merge_asof tolerance``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [ts]]
    rf0 = right.select(
        *keys,
        F.col(ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(ts).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias("__payload"),
    )
    lf0 = left.select(
        *keys,
        F.col(ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    ptype = rf0.schema["__payload"].dataType
    ltype = lf0.schema["__lrow"].dataType
    lf = lf0.withColumn("__payload", F.lit(None).cast(ptype))
    rf = rf0.withColumn("__lrow", F.lit(None).cast(ltype))
    u = rf.unionByName(lf)
    # right rows (__side 0) sort before left rows at equal ts, so an
    # equal-timestamp right row is visible to the left row — the >= contract.
    # __payload (struct compare: matched ts, then right_cols in order) is the
    # deterministic tie-break when several right rows share (keys, ts):
    # last() then always selects the struct-max payload, not whichever row
    # the partition happened to order last.
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side", "__payload")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
    out = matched.where(F.col("__side") == 1)
    if tolerance_us is not None:
        # NTZ timestamps need an ltz cast before unix_micros (UTC session)
        _us = lambda c: F.unix_micros(c.cast("timestamp_ltz"))
        out = out.withColumn(
            "__m",
            F.when(
                _us(F.col("__t")) - _us(F.col("__m.__rts")) <= F.lit(tolerance_us),
                F.col("__m"),
            ),
        )
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        F.col("__m.__rts").alias(f"{ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    pt_ts: str,
    start: str,
    end: str,
    bin_us: int = 600_000_000,
) -> DataFrame:
    """Point-in-interval range join, scale-safe: Spark plans a raw
    ``p.ts BETWEEN i.start AND i.end`` join as a per-key nested loop
    (every point x every interval in the key). Time-binning restores an
    equi-join: intervals explode into the fixed-width bins they overlap,
    points hash into their single bin, the join runs on (keys, bin) and a
    residual BETWEEN filter trims bin-edge false positives. Each (point,
    interval) pair meets in exactly one bin (the point's), so no dedup.

    Cost: |intervals| x (interval_span / bin_us + 1) replicated rows —
    pick ``bin_us`` near the typical interval span so replication stays
    O(1) per interval. Column names must be disjoint apart from the keys
    (pre-alias on either side otherwise); returns inner-join rows with all
    point + interval columns.
    """
    keys = [on] if isinstance(on, str) else list(on)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp_ltz"))
    i2 = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(us(start) / F.lit(bin_us)),
                F.floor(us(end) / F.lit(bin_us)),
            )
        ),
    )
    p2 = points.withColumn("__bin", F.floor(us(pt_ts) / F.lit(bin_us)))
    return (
        p2.join(i2, keys + ["__bin"])
        .where(us(pt_ts).between(us(start), us(end)))
        .drop("__bin")
    )


def gapfill_time_buckets(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
    fill: str = "locf",
) -> DataFrame:
    """Time-bucket gap-fill — the hypertable ``time_bucket_gapfill``
    continuous-aggregate shape (the reference has no time-series layer;
    SURVEY.md §2.F notes these as Spark-native extensions): aggregate
    ``value_col`` into dense per-key time buckets, MATERIALIZING the missing
    buckets, and fill their value by carry-forward, linear interpolation,
    or zero.

    Scale shape: one two-phase hash aggregate (bucketed sums), one tiny
    per-key min/max agg, a ``sequence()`` + ``explode`` to generate the
    dense bucket spine JVM-side (no driver loop, no Python), a left join
    spine<-agg on (keys, bucket) and one window pass for the fill — the
    spine explode is proportional to the OUTPUT, not the input.

    ``fill``:
    - ``'locf'``  — last observation carried forward (NULL before the first
      observation); exact integer arithmetic end to end.
    - ``'linear'``— interpolate between the previous and next observed
      buckets, ``round(..., 6)``; endpoints carry forward/backward.
    - ``'zero'``  — missing buckets get 0.

    Output: (keys..., bucket_ts, n_events, value_sum, filled, is_gap)."""
    if fill not in ("locf", "linear", "zero"):
        raise ValueError(f"unknown fill mode {fill!r}")
    b = F.date_trunc(bucket, F.col(ts_col))
    agg = (
        df.groupBy(*keys, b.alias("bucket_ts"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("value_sum"),
        )
    )
    step = F.expr(f"interval 1 {bucket}")
    spine = (
        agg.groupBy(*keys)
        .agg(F.min("bucket_ts").alias("__lo"), F.max("bucket_ts").alias("__hi"))
        .select(
            *keys,
            F.explode(F.sequence("__lo", "__hi", step)).alias("bucket_ts"),
        )
    )
    dense = spine.join(agg, [*keys, "bucket_ts"], "left").select(
        *keys,
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "value_sum",
    )
    w = Window.partitionBy(*keys).orderBy("bucket_ts")
    if fill == "zero":
        filled = F.coalesce("value_sum", F.lit(0))
    elif fill == "locf":
        filled = F.last("value_sum", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:  # linear
        prev_v = F.last("value_sum", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        prev_t = F.last(
            F.when(F.col("value_sum").isNotNull(), F.col("bucket_ts")), ignorenulls=True
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        next_v = F.first("value_sum", ignorenulls=True).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        next_t = F.first(
            F.when(F.col("value_sum").isNotNull(), F.col("bucket_ts")), ignorenulls=True
        ).over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        span = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
        pos = F.unix_timestamp("bucket_ts") - F.unix_timestamp(prev_t)
        interp = F.round(
            prev_v + (next_v - prev_v) * pos / F.nullif(span, F.lit(0)), 6
        )
        filled = (
            F.when(F.col("value_sum").isNotNull(), F.col("value_sum"))
            .when(prev_v.isNull(), next_v)       # before first obs
            .when(next_v.isNull(), prev_v)       # after last obs
            .otherwise(interp)
        )
    return dense.select(
        *keys,
        "bucket_ts",
        "n_events",
        "value_sum",
        filled.alias("filled"),
        (F.col("value_sum").isNull()).alias("is_gap"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    window_s: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: for each user, the first time they
    completed each step of ``steps`` IN ORDER — step k must happen
    strictly after step k-1 and within ``window_s`` of step 1 (the
    conversion window). The product-analytics primitive behind
    conversion/drop-off reports.

    Returns one row per user who completed step 1:
    (user, step_reached, t_1..t_k) with times in epoch MICROS (BIGINT,
    NULL once the funnel is abandoned) — integer timestamps keep the
    result engine-exact.

    100 TB shape: step k is ONE min-aggregation over the events
    pre-filtered to that step's type, joined back on the user key —
    k-1 equi-joins total, no window over the raw stream, no per-user
    event sorting; heavy users collapse in the partial (map-side) min
    before any shuffle.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    base = events.select(
        F.col(user_col).alias("user"),
        # NTZ timestamps need an ltz cast before unix_micros (UTC session)
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias("us"),
        F.col(type_col).alias("et"),
    )
    cur = (
        base.where(F.col("et") == steps[0])
        .groupBy("user")
        .agg(F.min("us").alias("t_1"))
    )
    win_us = window_s * 1_000_000
    for i, step in enumerate(steps[1:], start=2):
        prev_cols = ["user", "t_1"] if i == 2 else ["user", "t_1", f"t_{i - 1}"]
        nxt = (
            base.where(F.col("et") == step)
            .join(cur.select(*prev_cols), "user")
            .where(
                (F.col("us") > F.col(f"t_{i - 1}"))
                & (F.col("us") <= F.col("t_1") + F.lit(win_us))
            )
            .groupBy("user")
            .agg(F.min("us").alias(f"t_{i}"))
        )
        cur = cur.join(nxt, "user", "left")
    reached = sum(
        (F.col(f"t_{i}").isNotNull().cast("int"))
        for i in range(1, len(steps) + 1)
    )
    return cur.select(
        "user",
        reached.cast("long").alias("step_reached"),
        *[F.col(f"t_{i}") for i in range(1, len(steps) + 1)],
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: users cohorted by the ISO week of
    their first event; for every (cohort_week, week_offset) cell, how many
    of that cohort were active that week.

    Returns (cohort_week 'YYYY-MM-DD', week_offset, n_active) — offset 0
    is the cohort week itself, so n_active at offset 0 is the cohort size.

    100 TB shape: the raw stream collapses to distinct (user, week) pairs
    first (two-phase agg), the per-user first-week is a second small agg,
    and the matrix is an agg over the joined pairs — the join key is the
    user id, never the raw event stream.
    """
    wk = F.to_date(F.date_trunc("week", F.col(ts_col)))
    uw = events.select(
        F.col(user_col).alias("user"), wk.alias("wk")
    ).dropDuplicates(["user", "wk"])
    first = uw.groupBy("user").agg(F.min("wk").alias("cohort"))
    return (
        uw.join(first, "user")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_active"))
    )


def anomaly_flags(
    events: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user k-sigma outlier flags with ALL-INTEGER arithmetic — the
    event-stream quality/anomaly filter, engine-exact by construction.

    The float test  (x - mean)² > k² · variance  (population variance)
    multiplies through by n² into BIGINT cross-multiplication on
    centi-unit values:

        (n·x − s)²  >  k² · (n·q − s²)      with s = Σx, q = Σx²

    so no mean, no stddev, no rounding seam — the flag is a pure function
    of integer sums (Welford/stddev float paths differ across engines in
    the last ulp exactly at the decision boundary; this cannot).

    Returns every event row's (event_id, user, value_centi, n, flagged).
    Shape: ONE two-phase groupBy(user) for (n, s, q), joined back; the
    flag itself is map-side. Users with one event are never flagged
    (variance undefined → 0 on both sides).

    The cross-multiplied comparison runs in DECIMAL(38,0): lhs² and n·q
    exceed int64 once a user has ~10⁵ centi-unit events, and Spark's
    non-ANSI mode would wrap silently where DuckDB raises — the exact
    engine-divergence this operator exists to rule out. DECIMAL keeps the
    test exact to 38 digits (sufficient for n ≤ 10⁹ events of ≤ 10⁹
    centi-units) at the gate scale and the 100 TB target alike.
    """
    vc = F.round(F.col(value_col) * 100).cast("long")
    base = events.select(
        "event_id", F.col(user_col).alias("user"), vc.alias("value_centi")
    )
    stats = base.groupBy("user").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("value_centi").cast("long").alias("s"),
        F.sum(F.col("value_centi") * F.col("value_centi"))
        .cast("long")
        .alias("q"),
    )
    dec = "decimal(38,0)"
    lhs = (
        F.col("n").cast(dec) * F.col("value_centi").cast(dec)
        - F.col("s").cast(dec)
    )
    rhs = F.lit(k * k).cast(dec) * (
        F.col("n").cast(dec) * F.col("q").cast(dec)
        - F.col("s").cast(dec) * F.col("s").cast(dec)
    )
    return base.join(stats, "user").select(
        "event_id",
        "user",
        "value_centi",
        "n",
        (lhs * lhs > rhs).alias("flagged"),
    )
