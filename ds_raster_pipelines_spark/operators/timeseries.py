"""Time-series joins Spark lacks as built-ins (brief: as-of / range join).

``asof_join`` — each probe row picks the build row with the greatest
``build_ts <= probe_ts`` per key (the "latest reference record as of this
event" join: forecasts→latest issuance, ticks→latest quote, events→latest
config). The reference does this imperatively per file pair (latest-wins
selection in ``floodscan_pipeline.py:292-301``); distributed, the naive
form is a per-key range join that explodes to |probe|x|build| per key.

Spark-first plan: TAG-UNION + ORDERED WINDOW —

    union(build tagged 0, probe tagged 1)
      → window per key ordered by (ts, tag)
      → last(build ROW STRUCT, ignoreNulls) over rows unbounded-preceding
      → keep probe rows

ONE shuffle on the key, sort-based O((n+m) log), no range explosion, no
cartesian anywhere. Equal timestamps: the build row sorts before the
probe (tag 0 < 1), giving closed ``<=`` semantics like DuckDB's
ASOF JOIN (the oracle twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_minutes``. lag + running
    sum over a PER-KEY window (never a global window): one shuffle on the
    key, then two windowed passes over sorted partitions. ``order_cols``
    breaks timestamp ties deterministically.

    Output: events + session_id (1-based per key).
    """
    order_cols = order_cols or []
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    ts = F.col(ts_col).cast("timestamp")
    prev = F.lag(ts).over(w)
    # Compare in INTEGER MICROSECONDS: cast('long') truncates to seconds,
    # so a sub-second-resolution gap within ~1 s of the threshold would
    # classify differently here vs an epoch_us oracle — exact on both
    # sides by construction, not by data luck.
    gap_us = F.unix_micros(ts) - F.unix_micros(prev)
    new_sess = F.when(
        prev.isNull() | (gap_us > gap_minutes * 60_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_ts: str = "ts",
    build_ts: str = "ts",
    values: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Probe rows + latest-at-or-before build ``values`` per ``on`` key.

    ``how='inner'`` drops probes with no preceding build row (DuckDB
    ASOF JOIN semantics); ``'left'`` keeps them with NULL values.
    Build rows should be unique per (key, build_ts); if not, which
    equal-timestamp row wins is tie-broken by the value columns' sort
    order (add a sequence column upstream for full control).
    """
    values = values or [c for c in build.columns if c not in set(on) | {build_ts}]
    # The matched build row travels as ONE NON-NULL STRUCT: last(ignorenulls)
    # over the struct picks the LATEST BUILD ROW itself. Filling each value
    # column independently would instead carry the latest NON-NULL value per
    # column — wrong when the matched row legitimately holds NULLs (columns
    # could even come from different build rows), and 'no match yet' would
    # be indistinguishable from 'matched row with NULL value'.
    b = build.select(
        *on,
        F.col(build_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_src"),
        F.struct(*[F.col(v) for v in values]).alias("_brow"),
    )
    p = probe.withColumn("_ts", F.col(probe_ts).cast("timestamp")).withColumn(
        "_src", F.lit(1)
    )
    u = p.unionByName(b, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_src", "_brow")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select("*", F.last("_brow", ignorenulls=True).over(w).alias("_m"))
    out = filled.where(F.col("_src") == 1)
    if how == "inner":
        out = out.where(F.col("_m").isNotNull())
    elif how != "left":
        raise ValueError(how)
    return out.select(
        *[c for c in probe.columns],
        *[F.col(f"_m.{v}").alias(v) for v in values],
    )


def interval_join(
    probe: DataFrame,
    windows: DataFrame,
    ts_us: str,
    start_us: str,
    end_us: str,
    bucket_us: int,
) -> DataFrame:
    """Range/interval join (probe.ts in [window.start, window.end)) as a
    BUCKETED EQUI-JOIN — the scale-safe lowering of the range predicate
    (the naive theta-join is a cartesian; Spark would broadcast-nested-
    loop it).

    Each window explodes to the integer time buckets it overlaps
    (``sequence`` + ``explode``); each probe row carries its single
    bucket; the join becomes an equi-join on bucket followed by the exact
    range filter. A (probe, window) match shares exactly ONE bucket — the
    probe's own — so no post-join dedup is needed. Shuffle volume =
    |probe| + |windows| * avg_buckets_per_window; pick ``bucket_us`` near
    the typical window length so that factor stays O(1). Timestamps are
    int64 microseconds throughout (cross-engine exact; no tz coupling).
    """
    bu = int(bucket_us)
    # integer `div`, not float `/`: micros ~1e15 sit near float64's exact-
    # integer limit and a rounded quotient would mis-bucket edge values
    w_exp = windows.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_us} div {bu}"),
                F.expr(f"({end_us} - 1) div {bu}"),
            )
        ),
    )
    p = probe.withColumn("_bucket", F.expr(f"{ts_us} div {bu}"))
    return (
        p.join(w_exp, "_bucket")
        .where((F.col(ts_us) >= F.col(start_us)) & (F.col(ts_us) < F.col(end_us)))
        .drop("_bucket")
    )
