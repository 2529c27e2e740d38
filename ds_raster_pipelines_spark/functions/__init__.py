"""Scalar function surface (SURVEY.md §2.7) — all pure Column expressions
(JVM-side, whole-stage-codegen); zero Python UDFs."""

from .scalars import (  # noqa: F401
    date_from_filename,
    date_range_df,
    filename_for,
    leadtime_months_col,
    lon_normalize,
    snap_coord,
    to_fc_month,
    to_fc_year,
    to_leadtime,
)
