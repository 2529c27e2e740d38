"""Constraint operators (SURVEY §2.8 V1-V6) — the validation gate.

Distributed form of the reference's pre-write ``validate_dataset``
(``/root/reference/src/utils/validation_utils.py:17-169``, invoked at
``src/pipelines/pipeline.py:275-276``): each invariant is a count-if
aggregate; the gate passes iff every violation count is zero. Expressing
checks as one aggregate pass keeps it a single scan (no per-check jobs).

Metadata model: the 15-field record (pipeline.py:74-93) as flat columns —
flat structs are Catalyst-checkable (nullability, dtype) where MapType is
not (SURVEY §1.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

METADATA_FIELDS = [
    "units",
    "averaging_period",
    "grid_resolution",
    "year_valid",
    "month_valid",
    "date_valid",
    "year_issued",
    "month_issued",
    "date_issued",
    "leadtime",
    "leadtime_units",
    "source",
    "version",
    "product",
    "download_date",
]


def _violations(name: str, pred: Column) -> Column:
    """count of rows violating ``pred`` (i.e. where NOT pred)."""
    return F.sum(F.when(pred, 0).otherwise(1)).alias(name)


def validation_report(
    df: DataFrame,
    lon_col: str = "lon_c",
    lat_col: str = "lat_c",
    crs_col: str | None = "crs",
    date_col: str | None = "date_valid_d",
    filename_col: str | None = "filename",
) -> DataFrame:
    """One-row report of violation counts. Zero everywhere = valid.

    V1 coordinate bounds (validation_utils.py:33-40)
    V2 CRS equality     (validation_utils.py:43-45)
    V5 filename↔metadata date consistency (validation_utils.py:87-97)
    V6 leadtime month consistency (validation_utils.py:105-169)
    (V3 dtype and V4 schema completeness are static checks — see
    assert_schema below — free at plan time, no scan needed.)
    """
    checks = [
        _violations("v1_lon_oob", F.col(lon_col).between(-180.0, 180.0)),
        _violations("v1_lat_oob", F.col(lat_col).between(-90.0, 90.0)),
    ]
    if crs_col is not None and crs_col in df.columns:
        checks.append(_violations("v2_crs_bad", F.col(crs_col) == "EPSG:4326"))
    if (
        filename_col is not None
        and date_col is not None
        and filename_col in df.columns
        and date_col in df.columns
    ):
        from ..functions.scalars import date_from_filename

        fdate, _ = date_from_filename(F.col(filename_col))
        checks.append(_violations("v5_filename_date_mismatch", fdate == F.col(date_col)))
    if {"year_issued", "month_issued", "year_valid", "month_valid", "leadtime"} <= set(df.columns):
        months_diff = (F.col("year_valid") - F.col("year_issued")) * 12 + (
            F.col("month_valid") - F.col("month_issued")
        )
        checks.append(_violations("v6_leadtime_mismatch", months_diff == F.col("leadtime")))
    checks.append(F.count(F.lit(1)).alias("n_rows"))
    return df.agg(*checks)


def metadata_completeness(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """V4 RUNTIME completeness (validation_utils.py:58-84, enforced at
    pipeline.py:273-274): per-field null-or-empty counts over the 15
    metadata fields, in ONE aggregate pass. The reference rejects a
    dataset whose attr is present but empty — a static schema gate cannot
    see that, so this is a scan-time check (the static dtype/presence
    gate remains assert_schema).

    Output long-form: (field, n_missing, n_rows), one row per field —
    valid iff every n_missing is 0.
    """
    fields = [f for f in (fields or METADATA_FIELDS) if f in df.columns]
    if not fields:
        raise ValueError("none of the metadata fields are present")
    missing = [
        F.sum(
            F.when(F.col(f).isNull() | (F.col(f).cast("string") == ""), 1).otherwise(0)
        ).alias(f)
        for f in fields
    ]
    wide = df.agg(F.count(F.lit(1)).alias("n_rows"), *missing)
    stack = ", ".join(f"'{f}', {f}" for f in fields)
    return wide.select(
        F.expr(f"stack({len(fields)}, {stack}) as (field, n_missing)"), "n_rows"
    ).orderBy("field")


def assert_schema(df: DataFrame, required: dict[str, str]) -> list[str]:
    """V3/V4: static schema gate — returns a list of problems (empty = ok).
    ``required`` maps column -> simpleString dtype (e.g. 'float')."""
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for col, dtype in required.items():
        if col not in have:
            problems.append(f"missing column {col}")
        elif have[col] != dtype:
            problems.append(f"column {col}: expected {dtype}, got {have[col]}")
    return problems


def validated_write_gate(df: DataFrame, report: DataFrame) -> bool:
    """The write gate: True iff every violation count is zero — the
    distributed analog of raising before the COG write
    (pipeline.py:275-277). Caller writes only when this returns True."""
    row = report.collect()[0].asDict()
    return all(v == 0 for k, v in row.items() if k != "n_rows")
