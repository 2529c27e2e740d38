"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (decode → H3 encode → PIP join →
zonal agg) at sf0.001. ``queries()``/``oracle_sql()`` pairs cover the
operator inventory of SURVEY.md §2; each oracle is ANSI SQL DuckDB runs on
the same parquet tables. Column names/aliases match exactly on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ds_raster_pipelines_spark import queries_registry as _reg

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ds_raster_pipelines_spark.plans.flagship import flagship_from_orders

    return flagship_from_orders(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _reg.queries()


def oracle_sql() -> dict[str, str]:
    return _reg.oracle_sql()
