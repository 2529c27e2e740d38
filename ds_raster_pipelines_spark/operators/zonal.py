"""Zonal statistics — the flagship aggregation (SURVEY.md §2.4 A3).

Distributed form of the reference's per-admin clip→mean loop
(``/root/reference/examples/era5_cogs.md:204-224``) followed by the
stats↔geometry hash join (``:226``): one PIP join then one hash aggregate.
Partial aggregation (map-side combine) is native; the only shuffle is the
final groupBy on adm_id (32-ish keys — trivially small reduce side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zonal_stats(
    joined: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    round_dp: int | None = 6,
) -> DataFrame:
    """Per-zone avg/min/max/sum/count of ``value_col``.

    ``round_dp`` quantizes float aggregates for cross-engine /
    cross-parallelism determinism (BASELINE.md correctness gate: identical
    hashes at local[8] vs local[32]).
    """
    keys = keys or ["adm_id"]
    v = F.col(value_col)

    def r(c):
        return F.round(c, round_dp) if round_dp is not None else c

    return joined.groupBy(*keys).agg(
        r(F.avg(v)).alias("avg_value"),
        r(F.min(v)).alias("min_value"),
        r(F.max(v)).alias("max_value"),
        r(F.sum(v)).alias("sum_value"),
        F.count(F.lit(1)).alias("n_tiles"),
    )
