"""Explicit hot-key skew handling — salted repartition (north rule).

AQE's skew-join splitting handles sort-merge spill skew, but a PIP join
whose polygon side explodes per covering cell concentrates on hot H3 cells
(dense polygon areas); the north rule demands *explicit* salting
(SURVEY.md §4). Pattern:

  big side : salt = pmod(xxhash64(<row-unique expr>), n_salt)  for hot keys,
             0 otherwise
  small side: hot keys replicated once per salt, cold keys salt 0
  join on (key, salt)                       -- hot key now spreads n_salt ways

Results are identical to the unsalted join (verified in tests); only the
shuffle layout changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Frequency sketch pass: keys with count > threshold. At 100 TB do
    this on a sample (``df.sample(0.001)`` with a scaled threshold) — the
    hot set is what matters, not exact counts."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_freq"))
        .where(F.col("_freq") > threshold)
        .select(key)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int,
    salt_expr: Column,
    hot: DataFrame | None = None,
    threshold: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big ⨝ small on ``key`` with hot keys salted ``n_salt``
    ways. ``hot`` (or ``threshold`` to compute it) selects which keys get
    salted; others join with salt 0 so the small side is only replicated
    for hot keys.

    ``salt_expr`` may be NON-deterministic (e.g. include
    ``monotonically_increasing_id()`` so same-valued rows spread — the
    canonical hot case): correctness does not depend on the salt value,
    because the small side replicates EVERY salt for a hot key, so any
    salt a row draws joins the same replicated rows. Under a task retry
    a row may re-salt differently; the joined result is identical for
    every salt assignment (asserted by the --pip-skew bench), only the
    shuffle placement changes. Prefer a deterministic expression like
    ``F.xxhash64("tile_id")`` only when rows with equal values are rare
    — it keeps retries byte-stable but collapses equal-valued rows onto
    one salt (ADVICE r7)."""
    if hot is None:
        if threshold is None:
            raise ValueError("pass hot= or threshold=")
        hot = hot_keys(big, key, threshold)
    hot_flagged = F.broadcast(hot.withColumn("_is_hot", F.lit(True)))

    big_s = (
        big.join(hot_flagged, key, "left")
        .withColumn(
            "_salt",
            F.when(F.col("_is_hot").isNotNull(), F.pmod(salt_expr, F.lit(n_salt)).cast("int"))
            .otherwise(F.lit(0)),
        )
        .drop("_is_hot")
    )
    small_s = (
        small.join(hot_flagged, key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_is_hot").isNotNull(), F.sequence(F.lit(0), F.lit(n_salt - 1))
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_salts", "_is_hot")
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")
