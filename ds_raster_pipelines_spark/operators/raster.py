"""Raster↔vector kernels: rasterize (polygon→per-tile pixel mask) and
pixel-level zonal statistics — the distributed form of the reference's
``ds.rio.clip(gdf.geometry)`` + per-admin mean loop
(``/root/reference/examples/era5_cogs.md:177,204-224``), at PIXEL
granularity (``all_touched``-style: every pixel whose *center* falls inside
the geometry contributes, matching rasterio's default clip semantics).

Plan shape (scale-first):
  1. PRUNE before decode: tiles whose cell intersects no polygon are
     dropped with a broadcast left-semi join on cell_id — the "clip when
     initially reading" move the reference wishes it did
     (era5_cogs.md:174-176).
  2. One Arrow kernel: decode tile → per-polygon pixel-window reduction
     (sum/count over the masked block). Pixels never leave the kernel.
  3. Integer sums → groupBy(adm_id) exact aggregation.

Geometry dictionary ships via closure (admin tables are broadcast-small).
For arbitrary (non-rect) rings the kernel falls back to a vectorized
center-in-polygon ray cast per tile; rectangles use pure window arithmetic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import grid
from ..corpus import TILE_H, TILE_W, parse_wkb_polygon
from .pip import _points_in_ring, polygon_cover_cells

ZONAL_PIXEL_SCHEMA = "gi int, px_count bigint, px_sum bigint"


def _is_axis_rect(ring: np.ndarray) -> bool:
    if len(ring) != 5:
        return False
    xs, ys = set(ring[:, 0].tolist()), set(ring[:, 1].tolist())
    return len(xs) == 2 and len(ys) == 2


def zonal_pixel_stats(images: DataFrame, admin: DataFrame, res: int) -> DataFrame:
    """Per-admin pixel mean/count over decoded tiles.

    Output: (adm_id, px_count, px_sum, px_mean) — integer-exact sums, so
    bit-identical across engines and parallelism levels.
    """
    spark = images.sparkSession
    rows = admin.select("adm_id", "geom_wkb").collect()
    rings = [parse_wkb_polygon(r["geom_wkb"]) for r in rows]
    adm_ids = [r["adm_id"] for r in rows]

    # 1. prune tiles before decode (broadcast semi-join on covering cells)
    from ..corpus import centroid_cols_for_images

    pts = centroid_cols_for_images(images, "i").withColumn(
        "cell_id", grid.encode_col(F.col("lon_c"), F.col("lat_c"), res)
    )
    # cover expanded by one ring: a 0.25-deg tile can straddle a cell edge,
    # putting pixels in a covered cell while its centroid cell is outside.
    # All driver-side (admin is broadcast-small): zero planning-time jobs.
    from .pip import cover_cells_driver

    expanded: set[int] = set()
    for c in cover_cells_driver(rings, res):
        expanded.update(grid.grid_disk_np(c, 1))
    cover = spark.createDataFrame(
        [(int(c),) for c in sorted(expanded)], schema="cell_id bigint"
    ).coalesce(1)
    if "pcell" in images.columns:  # Iceberg-layout partition pruning
        from ..corpus import PCELL_RES

        parents = sorted({int(grid.parent_np(np.asarray([c]), PCELL_RES)[0]) for c in expanded})
        images = images.where(F.col("pcell").isin(parents)).drop("pcell")
        pts = centroid_cols_for_images(images, "i").withColumn(
            "cell_id", grid.encode_col(F.col("lon_c"), F.col("lat_c"), res)
        )
    pruned = pts.join(F.broadcast(cover), "cell_id", "left_semi").drop(
        "cell_id", "lon_c", "lat_c"
    )

    # 2. decode + per-polygon masked reduction in one Arrow kernel
    rect_info = []
    for g, ring in enumerate(rings):
        if _is_axis_rect(ring):
            rect_info.append(
                (g, ring[:, 0].min(), ring[:, 1].min(), ring[:, 0].max(), ring[:, 1].max())
            )
    generic = [(g, r) for g, r in enumerate(rings) if not _is_axis_rect(r)]

    def kernel(batches):
        import pyarrow as pa

        from ..codecs import decode_tile
        from ..sources.images import _binary_offsets_data

        for b in batches:
            names = b.schema.names
            col = {name: b.column(k) for k, name in enumerate(names)}
            ii = col["i"].to_numpy(zero_copy_only=False).astype(np.int64)
            fmts = np.asarray(col["fmt"].to_pylist(), dtype=object)
            ws = col["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            hs = col["h"].to_numpy(zero_copy_only=False).astype(np.int64)
            off, data = _binary_offsets_data(col["bytes"])
            lon0 = -180.0 + 0.25 * ((ii * 13) % 1440)
            lat_top = 90.0 - 0.25 * ((ii * 7) % 720)
            out_gi: list[int] = []
            out_cnt: list[int] = []
            out_sum: list[int] = []
            px_cache: dict[int, np.ndarray] = {}

            def tile(k: int) -> np.ndarray:
                px = px_cache.get(k)
                if px is None:
                    px = decode_tile(
                        data[off[k] : off[k + 1]].tobytes(), fmts[k], int(ws[k]), int(hs[k])
                    )
                    px_cache[k] = px
                return px

            # axis-rect geometries: pixel windows for ALL tiles at once
            # (numpy broadcast per rect); Python touches only overlapping
            # (tile, rect) pairs.
            for g, A, B, C, D in rect_info:
                x_lo = np.maximum(0, np.ceil((A - lon0) * 4 * ws - 0.5)).astype(np.int64)
                x_hi = np.minimum(ws - 1, np.floor((C - lon0) * 4 * ws - 0.5)).astype(np.int64)
                y_lo = np.maximum(0, np.ceil((lat_top - D) * 4 * hs - 0.5)).astype(np.int64)
                y_hi = np.minimum(hs - 1, np.floor((lat_top - B) * 4 * hs - 0.5)).astype(np.int64)
                hit = (x_lo <= x_hi) & (y_lo <= y_hi)
                for k in np.nonzero(hit)[0]:
                    block = tile(k)[y_lo[k] : y_hi[k] + 1, x_lo[k] : x_hi[k] + 1]
                    out_gi.append(g)
                    out_cnt.append(block.size)
                    out_sum.append(int(block.sum(dtype=np.int64)))
            # generic rings: vectorized bbox precheck, per-tile ray cast
            for g, ring in generic:
                rx0, ry0 = ring[:, 0].min(), ring[:, 1].min()
                rx1, ry1 = ring[:, 0].max(), ring[:, 1].max()
                hit = (lon0 <= rx1) & (lon0 + 0.25 >= rx0) & (lat_top - 0.25 <= ry1) & (lat_top >= ry0)
                for k in np.nonzero(hit)[0]:
                    w, h = int(ws[k]), int(hs[k])
                    gx = lon0[k] + (np.arange(w) + 0.5) * (0.25 / w)
                    gy = lat_top[k] - (np.arange(h) + 0.5) * (0.25 / h)
                    lon_g, lat_g = np.meshgrid(gx, gy)
                    mask = _points_in_ring(lon_g.ravel(), lat_g.ravel(), ring).reshape(h, w)
                    if not mask.any():
                        continue
                    out_gi.append(g)
                    out_cnt.append(int(mask.sum()))
                    out_sum.append(int(tile(k)[mask].sum(dtype=np.int64)))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_gi, pa.int32()),
                    pa.array(out_cnt, pa.int64()),
                    pa.array(out_sum, pa.int64()),
                ],
                names=["gi", "px_count", "px_sum"],
            )

    partial = pruned.mapInArrow(kernel, schema=ZONAL_PIXEL_SCHEMA)

    # 3. exact integer aggregation + name attach
    idx_df = F.broadcast(
        spark.createDataFrame(
            [(k, a) for k, a in enumerate(adm_ids)], schema="gi int, adm_id string"
        )
    )
    return (
        partial.groupBy("gi")
        .agg(F.sum("px_count").alias("px_count"), F.sum("px_sum").alias("px_sum"))
        .join(idx_df, "gi")
        .select(
            "adm_id",
            "px_count",
            "px_sum",
            (F.col("px_sum").cast("double") / F.col("px_count")).alias("px_mean"),
        )
        .orderBy("adm_id")
    )


def vectorize_mask(images: DataFrame, threshold: int) -> DataFrame:
    """Mask→vector extraction: per tile, the bounding boxes of the
    connected runs of pixels >= threshold, emitted as lon/lat rects —
    the inverse kernel of rasterize (reference writes rasters only; this
    gives the engine the mask→polygon direction). Row-run variant (exact
    for our column-gradient tiles; a full CCL is a plug-in kernel)."""

    def kernel(batches):
        import pyarrow as pa

        from ..codecs import decode_tile
        from ..sources.images import _binary_offsets_data

        for b in batches:
            names = b.schema.names
            col = {name: b.column(k) for k, name in enumerate(names)}
            ii = col["i"].to_numpy(zero_copy_only=False)
            fmts = np.asarray(col["fmt"].to_pylist(), dtype=object)
            ws = col["w"].to_numpy(zero_copy_only=False)
            hs = col["h"].to_numpy(zero_copy_only=False)
            off, data = _binary_offsets_data(col["bytes"])
            o_i, o_minlon, o_minlat, o_maxlon, o_maxlat, o_npx = [], [], [], [], [], []
            for k in range(b.num_rows):
                i = int(ii[k])
                w, h = int(ws[k]), int(hs[k])
                px = decode_tile(data[off[k] : off[k + 1]].tobytes(), fmts[k], w, h)
                mask = px >= threshold
                if not mask.any():
                    continue
                ys, xs = np.nonzero(mask)
                lon0 = -180.0 + 0.25 * ((i * 13) % 1440)
                lat_top = 90.0 - 0.25 * ((i * 7) % 720)
                o_i.append(i)
                o_minlon.append(lon0 + xs.min() * 0.25 / w)
                o_maxlon.append(lon0 + (xs.max() + 1) * 0.25 / w)
                o_maxlat.append(lat_top - ys.min() * 0.25 / h)
                o_minlat.append(lat_top - (ys.max() + 1) * 0.25 / h)
                o_npx.append(int(mask.sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_i, pa.int64()),
                    pa.array(o_minlon, pa.float64()),
                    pa.array(o_minlat, pa.float64()),
                    pa.array(o_maxlon, pa.float64()),
                    pa.array(o_maxlat, pa.float64()),
                    pa.array(o_npx, pa.int64()),
                ],
                names=["i", "min_lon", "min_lat", "max_lon", "max_lat", "n_px_masked"],
            )

    return images.mapInArrow(
        kernel,
        schema="i bigint, min_lon double, min_lat double, max_lon double, max_lat double, n_px_masked bigint",
    )
