"""Scalar expressions re-expressing the reference's utility functions.

Reference parity (file:line cites are into /root/reference):
  F1  lon_normalize      src/utils/raster_utils.py:14-32   ((lon+180)%360)-180
  F2  snap_coord         src/utils/raster_utils.py:35-39   round(coord, 4)
  F7  date_from_filename src/utils/date_utils.py:59-74     regex + fallback
  F8  filename_for       src/pipelines/era5_pipeline.py:30-35 et al.
  F9  date_range_df      src/utils/date_utils.py:18-56     inclusive range
  F10 leadtime utils     src/utils/leadtime_utils.py:1-64  mod-12 arithmetic
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def lon_normalize(lon: Column) -> Column:
    """F1: wrap longitudes into [-180, 180). ((lon + 180) % 360) - 180,
    with pmod so negatives wrap like numpy's %."""
    return F.pmod(lon + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)


def snap_coord(coord: Column, dp: int = 4) -> Column:
    """F2: defeat float drift by snapping to ``dp`` decimals. (Our engine
    joins on integer cell ids instead — this exists for parity and for
    grid-alignment tolerance joins, SURVEY J6.)"""
    return F.round(coord, dp)


_DATE_RX = r"([iv_-])(\d{4}-\d{2}-\d{2})"
_COMPACT_RX = r"(\d{8})"


def date_from_filename(name: Column) -> tuple[Column, Column]:
    """F7: (date, prefix_flag) from a filename. ISO `v2020-06-01` style
    first, `20231129` compact fallback — mirrors date_utils.py:59-74.
    prefix_flag: 'v'=valid, 'i'=issued, else separator."""
    iso = F.regexp_extract(name, _DATE_RX, 2)
    compact = F.regexp_extract(name, _COMPACT_RX, 1)
    date = F.coalesce(
        F.when(iso != "", F.to_date(iso, "yyyy-MM-dd")),
        F.when(compact != "", F.to_date(compact, "yyyyMMdd")),
    )
    prefix = F.when(iso != "", F.regexp_extract(name, _DATE_RX, 1)).otherwise(F.lit(None))
    return date, prefix


def filename_for(prefix: str, date: Column, suffix: str = ".tif") -> Column:
    """F8: per-pipeline filename grammar, e.g.
    ``precip_reanalysis_v{date:%Y-%m-%d}.tif`` (era5_pipeline.py:34-35)."""
    return F.concat(F.lit(prefix), F.date_format(date, "yyyy-MM-dd"), F.lit(suffix))


def date_range_df(
    spark: SparkSession, start: str, end: str, freq: str = "D", col: str = "date"
) -> DataFrame:
    """F9: inclusive date range as a DataFrame — sequence + explode.
    freq D/M/Y mirrors the coverage spec (pipeline.py:95-114)."""
    interval = {"D": "interval 1 day", "M": "interval 1 month", "Y": "interval 1 year"}[freq]
    return spark.range(1).select(
        F.explode(
            F.expr(f"sequence(to_date('{start}'), to_date('{end}'), {interval})")
        ).alias(col)
    )


def to_leadtime(issued_month: Column, valid_month: Column) -> Column:
    """F10: mod-12 month difference (leadtime_utils.py:1-15)."""
    return F.pmod(valid_month - issued_month, F.lit(12))


def leadtime_months_col(start_month: Column, n: int) -> Column:
    """F10: the n consecutive forecast months from start (1-based months),
    leadtime_utils.py:18-30. sequence+transform, pure JVM."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda k: F.pmod(start_month + k - 1, F.lit(12)) + 1,
    )


def to_fc_month(issued_month: Column, leadtime: Column) -> Column:
    """F10: forecast month = issued + leadtime (mod 12, 1-based),
    leadtime_utils.py:33-47."""
    return F.pmod(issued_month + leadtime - 1, F.lit(12)) + 1


def to_fc_year(issued_month: Column, issued_year: Column, leadtime: Column) -> Column:
    """F10: forecast year with month-wrap carry (leadtime_utils.py:50-64)."""
    return issued_year + F.floor((issued_month + leadtime - 1) / 12)
