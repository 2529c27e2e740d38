"""Point-in-polygon spatial join — filter-refine, the core new operator.

Distributed form of the reference's polygon clip
(``/root/reference/examples/era5_cogs.md:177,210`` — ``rio.clip`` with and
without ``all_touched``), SURVEY.md §2.3 J5:

  1. COVER   : polygons explode to the H3/S2-style cells intersecting them
               (coarse, integer keys).
  2. FILTER  : tiles equi-join polygons on cell_id — broadcast when the
               polygon side is small (admin tables are), salted SMJ when a
               cell is hot (operators/skew.py).
  3. REFINE  : exact geometric containment — a vectorized even-odd
               ray-cast over WKB rings, Arrow-batched (no per-row Python);
               or a JVM-only bbox predicate for axis-aligned geometries.

Semantics flag mirrors the reference: ``centroid`` (default clip: a tile
belongs iff its centroid is inside) vs ``all_touched`` (any intersection).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import grid
from ..corpus import parse_wkb_polygon

# ----------------------------------------------------------- cover stage ---


def polygon_cover_cells(admin: DataFrame, res: int) -> DataFrame:
    """(adm_id, cell_id) covering pairs at ``res``.

    Runs distributed (mapInPandas over the polygon table) so it scales to
    large polygon sets; the bbox of each WKB ring bounds the cover. For a
    1000-executor cluster the output is what gets broadcast — cap cell
    explosion by choosing ``res`` so |cells per polygon| stays ~1e2-1e3
    (SURVEY.md §7 risk register).
    """
    cols = admin.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            adm_ids: list[str] = []
            cells: list[np.ndarray] = []
            for _, row in pdf.iterrows():
                if "geom_wkb" in cols and row.get("geom_wkb") is not None:
                    ring = parse_wkb_polygon(row["geom_wkb"])
                    a, b = float(ring[:, 0].min()), float(ring[:, 1].min())
                    c, d = float(ring[:, 0].max()), float(ring[:, 1].max())
                else:
                    a, b, c, d = row["min_lon"], row["min_lat"], row["max_lon"], row["max_lat"]
                cc = grid.cover_rect_np(a, b, c, d, res)
                adm_ids.append(row["adm_id"])
                cells.append(cc)
            counts = [len(c) for c in cells]
            yield pd.DataFrame(
                {
                    "adm_id": np.repeat(np.array(adm_ids, dtype=object), counts),
                    "cell_id": np.concatenate(cells) if cells else np.array([], np.int64),
                }
            )

    return admin.mapInPandas(kernel, schema="adm_id string, cell_id bigint")


# ---------------------------------------------------------- refine stage ---


def _points_in_ring(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast (edges loop is over the few polygon
    vertices; points are the vectorized axis)."""
    inside = np.zeros(lon.shape, dtype=bool)
    x, y = ring[:, 0], ring[:, 1]
    n = len(ring) - 1  # closed ring
    for e in range(n):
        x1, y1, x2, y2 = x[e], y[e], x[e + 1], y[e + 1]
        crosses = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (lat - y1) * (x2 - x1) / (y2 - y1)
        inside ^= crosses & (lon < xint)
    return inside


@F.pandas_udf(T.BooleanType())
def contains_udf(lon: pd.Series, lat: pd.Series, wkb: pd.Series) -> pd.Series:
    """Exact PIP refine. Groups the batch by polygon so the ray cast runs
    vectorized once per distinct geometry per batch."""
    lon_v = lon.to_numpy(np.float64)
    lat_v = lat.to_numpy(np.float64)
    out = np.zeros(len(lon_v), dtype=bool)
    codes, uniques = pd.factorize(wkb, use_na_sentinel=True)
    for g, blob in enumerate(uniques):
        mask = codes == g
        ring = parse_wkb_polygon(blob)
        out[mask] = _points_in_ring(lon_v[mask], lat_v[mask], ring)
    return pd.Series(out)


# ------------------------------------------------------------- full join ---


def pip_join(
    points: DataFrame,
    admin: DataFrame,
    res: int,
    lon_col: str = "lon_c",
    lat_col: str = "lat_c",
    refine: str = "wkb",
    broadcast_cover: bool = True,
) -> DataFrame:
    """points (with lon/lat) ⨝ admin polygons. Returns points + adm_id.

    ``refine='wkb'``  : generic exact ray-cast kernel (Arrow-batched).
    ``refine='bbox'`` : JVM-only between-predicate (axis-aligned rects) —
                        whole-stage-codegen fast path, used as the oracle
                        twin of the wkb path in tests.
    """
    pts = points.withColumn("cell_id", grid.encode_col(F.col(lon_col), F.col(lat_col), res))
    cover = polygon_cover_cells(admin, res)
    if broadcast_cover:
        cover = F.broadcast(cover)
    cand = pts.join(cover, "cell_id")
    if refine == "bbox":
        adm = F.broadcast(admin.select("adm_id", "min_lon", "min_lat", "max_lon", "max_lat"))
        return (
            cand.join(adm, "adm_id")
            .where(
                F.col(lon_col).between(F.col("min_lon"), F.col("max_lon"))
                & F.col(lat_col).between(F.col("min_lat"), F.col("max_lat"))
            )
            .drop("min_lon", "min_lat", "max_lon", "max_lat")
        )
    adm = F.broadcast(admin.select("adm_id", "geom_wkb"))
    return (
        cand.join(adm, "adm_id")
        .where(contains_udf(F.col(lon_col), F.col(lat_col), F.col("geom_wkb")))
        .drop("geom_wkb")
    )
