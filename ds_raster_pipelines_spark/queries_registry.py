"""Registry of driver-checkable (Spark query, DuckDB oracle SQL) pairs.

Each entry exercises operators from SURVEY.md §2 over the driver's testdata
tables. Conventions that make the oracle comparison *bit-exact*:

* Float accumulations go through integer fixed-point (cents / e4 units):
  sums are exact and order-independent, so results are identical across
  engines AND across parallelism levels (local[8] vs local[32] — the
  BASELINE.md determinism gate). At 100 TB the same trick is the right
  call (exact long accumulators; decimal(38) when products can overflow).
* Every computed column is aliased identically on both sides.
* Timestamps: session TZ pinned to UTC (session.py) to match DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import corpus, grid

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _pq(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# =====================================================================
# Flagship: decode → H3 encode → PIP join → zonal agg   (SURVEY §3.3)
# =====================================================================

_META = corpus.images_meta_sql("o_orderkey")

_FLAGSHIP_ORACLE = f"""
WITH img AS (
  SELECT {_META['i']} AS i,
         {_META['decoded_mean']} AS mean_value,
         {_META['lon_c']} AS lon_c,
         {_META['lat_c']} AS lat_c
  FROM orders
)
SELECT adm_id,
       round(avg(mean_value), 6) AS avg_value,
       round(min(mean_value), 6) AS min_value,
       round(max(mean_value), 6) AS max_value,
       round(sum(mean_value), 6) AS sum_value,
       count(*) AS n_tiles
FROM img
JOIN {corpus.admin_sql_values()}
  ON lon_c BETWEEN min_lon AND max_lon AND lat_c BETWEEN min_lat AND max_lat
GROUP BY adm_id
ORDER BY adm_id
"""


@register("flagship_zonal_decode", _FLAGSHIP_ORACLE)
def flagship_zonal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline incl. real byte decode (raw/png/qnt codecs); the
    oracle verifies the decoded per-tile means analytically."""
    from .plans.flagship import flagship_from_orders

    return flagship_from_orders(spark, sf_dir, refine="wkb")


@register("pip_zonal_bbox", _FLAGSHIP_ORACLE)
def pip_zonal_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same zonal result via the JVM-only bbox refine path and analytic
    means (isolates the spatial join from the codecs)."""
    from .operators.pip import pip_join
    from .operators.zonal import zonal_stats
    from .plans.flagship import FLAGSHIP_RES

    i = F.col("i")
    c = i % corpus.C_MOD
    pts = corpus.centroid_cols_for_images(
        _pq(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("i"))
        .withColumn(
            "mean_value",
            F.when(i % 16 == 0, c + F.lit(31.0)).otherwise(c + F.lit(31.5)),
        )
    )
    joined = pip_join(pts, corpus.admin_df(spark), res=FLAGSHIP_RES, refine="bbox")
    return zonal_stats(joined, "mean_value").orderBy("adm_id")


# =====================================================================
# Relational core over TPC-H-ish tables
# =====================================================================

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       sum(cast(l_quantity as bigint))                              AS sum_qty,
       cast(sum(cast(round(l_extendedprice * 100) as bigint)) as double) / 100.0  AS sum_base_price,
       cast(sum(cast(round(l_extendedprice * 100) as bigint)
            * (100 - cast(round(l_discount * 100) as bigint))) as double) / 10000.0 AS sum_disc_price,
       cast(sum(cast(round(l_extendedprice * 100) as bigint)
            * (100 - cast(round(l_discount * 100) as bigint))
            * (100 + cast(round(l_tax * 100) as bigint))) as double) / 1000000.0   AS sum_charge,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (SURVEY A1/A2 group-agg family) with exact integer
    fixed-point accumulators — bit-identical across engines/parallelism."""
    li = _pq(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc = F.round(F.col("l_discount") * 100, 0).cast("long")
    tax = F.round(F.col("l_tax") * 100, 0).cast("long")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            (F.sum(cents).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(cents * (100 - disc)).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(cents * (100 - disc) * (100 + tax)).cast("double") / 1000000.0).alias(
                "sum_charge"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_JOIN_REV_ORACLE = """
SELECT c_mktsegment,
       cast(sum(cast(round(o_totalprice * 100) as bigint)) as double) / 100.0 AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("join_customer_revenue", _JOIN_REV_ORACLE)
def join_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash join (SURVEY J3): orders ⨝ customer, revenue per segment.
    Customer side is broadcast (small dim)."""
    orders = _pq(spark, sf_dir, "orders")
    cust = _pq(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            (F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).cast("double") / 100.0).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


# =====================================================================
# Grid operators (cell encode / parent rollup)
# =====================================================================

_RES_H = 5
_CELL_SQL = grid.encode_sql(_META["lon_c"], _META["lat_c"], _RES_H)

_CELL_HIST_ORACLE = f"""
SELECT {_CELL_SQL} AS cell_id, count(*) AS n_points
FROM orders
GROUP BY cell_id
ORDER BY cell_id
"""


@register("cell_encode_histogram", _CELL_HIST_ORACLE)
def cell_encode_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3/S2-style encode as pure JVM bit arithmetic (SURVEY §7 step 3)."""
    pts = corpus.centroid_cols_for_images(
        _pq(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("i"))
    )
    return (
        pts.withColumn("cell_id", grid.encode_col(F.col("lon_c"), F.col("lat_c"), _RES_H))
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("cell_id")
    )


_PARENT_SQL = grid.parent_sql(_CELL_SQL, 2, _RES_H)

_ROLLUP_ORACLE = f"""
WITH cells AS (
  SELECT {_CELL_SQL} AS cell_id FROM orders
)
SELECT {grid.parent_sql('cell_id', 2, _RES_H)} AS parent_id,
       count(*) AS n_points,
       count(DISTINCT cell_id) AS n_children
FROM cells
GROUP BY parent_id
ORDER BY parent_id
"""


@register("cell_parent_rollup", _ROLLUP_ORACLE)
def cell_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup: child cells (res 5) → parent (res 2) —
    hypertable-rollup analog; pure bit ops, no UDF."""
    pts = corpus.centroid_cols_for_images(
        _pq(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("i"))
    )
    cells = pts.withColumn("cell_id", grid.encode_col(F.col("lon_c"), F.col("lat_c"), _RES_H))
    return (
        cells.withColumn("parent_id", grid.parent_col(F.col("cell_id"), 2, _RES_H))
        .groupBy("parent_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.countDistinct("cell_id").alias("n_children"),
        )
        .orderBy("parent_id")
    )
