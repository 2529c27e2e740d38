"""The flagship query: decode → H3 encode → PIP join → zonal aggregate.

This is the BASELINE.json metric path (tiles/sec end-to-end) and the Spark
form of the reference's consumption notebook
(``/root/reference/examples/era5_cogs.md`` §3.3 of SURVEY.md):

    images (Iceberg-layout corpus)
      → decode kernel (Arrow)            # scan + normalize
      → centroid → cell_id (JVM bit ops) # H3/S2 encode, no UDF
      → PIP join vs admin polygons       # broadcast filter + exact refine
      → groupBy(adm_id).agg(...)         # zonal stats

Plan properties at scale: the only wide exchange is the final 32-key
aggregate (partial agg map-side); polygon side is broadcast; decode is
pipelined with the scan (no materialization of pixels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import corpus
from ..operators.pip import pip_join
from ..operators.zonal import zonal_stats
from ..sources.images import decode_stats

FLAGSHIP_RES = 4  # cell ~5.6 deg: 32 polygons cover ~40-400 cells each


def flagship(
    images: DataFrame,
    admin: DataFrame,
    res: int = FLAGSHIP_RES,
    refine: str = "wkb",
) -> DataFrame:
    tiles = decode_stats(images)
    tiles = corpus.centroid_cols_for_images(tiles, "i")
    joined = pip_join(tiles, admin, res=res, refine=refine)
    return zonal_stats(joined, "mean_value").orderBy("adm_id")


def flagship_from_orders(spark: SparkSession, sf_dir: str, refine: str = "wkb") -> DataFrame:
    images = corpus.images_from_orders(spark, sf_dir)
    return flagship(images, corpus.admin_df(spark), refine=refine)
