"""Codecs round-trip, PSNR gate, corpus determinism, PIP kernel goldens."""

from __future__ import annotations

import numpy as np
import pytest

from ds_raster_pipelines_spark import codecs, corpus
from ds_raster_pipelines_spark.operators.pip import _points_in_ring


@pytest.mark.parametrize("i", [0, 1, 4, 16, 96, 97, 1439, 123456])
def test_codec_roundtrip_and_psnr(i):
    px = corpus.pixels_for(i)
    fmt = corpus.fmt_for(i)
    blob = codecs.encode_tile(px, fmt)
    back = codecs.decode_tile(blob, fmt, corpus.TILE_W, corpus.TILE_H)
    if fmt in codecs.LOSSLESS_FMTS:
        assert np.array_equal(px, back)
        assert codecs.psnr(px, back) == float("inf")
    else:
        p = codecs.psnr(px, back)
        assert p >= 40.0, f"lossy PSNR gate failed: {p}"


def test_png_is_real_png():
    px = corpus.pixels_for(8)
    blob = codecs.encode_png(px)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in blob and b"IDAT" in blob and b"IEND" in blob


def test_expected_decoded_mean_closed_form():
    for i in [0, 1, 3, 4, 16, 32, 96, 97, 200, 991]:
        px = corpus.pixels_for(i)
        blob = codecs.encode_tile(px, corpus.fmt_for(i))
        back = codecs.decode_tile(blob, corpus.fmt_for(i), corpus.TILE_W, corpus.TILE_H)
        assert back.mean(dtype=np.float64) == corpus.expected_decoded_mean(i)


def test_wkb_roundtrip():
    blob = corpus.wkb_polygon_rect(-10, -5, 20, 15)
    ring = corpus.parse_wkb_polygon(blob)
    assert ring.shape == (5, 2)
    assert ring[0].tolist() == [-10, -5] and ring[2].tolist() == [20, 15]


def test_ray_cast_golden():
    ring = corpus.parse_wkb_polygon(corpus.wkb_polygon_rect(0, 0, 10, 10))
    lon = np.array([5.0, -1.0, 10.5, 0.125, 9.875])
    lat = np.array([5.0, 5.0, 5.0, 0.125, 9.875])
    assert _points_in_ring(lon, lat, ring).tolist() == [True, False, False, True, True]
    # non-rectangular: triangle
    import struct

    tri_pts = [(0, 0), (10, 0), (0, 10), (0, 0)]
    tri = struct.pack("<BIII", 1, 3, 1, 4) + b"".join(struct.pack("<dd", x, y) for x, y in tri_pts)
    ring = corpus.parse_wkb_polygon(tri)
    lon = np.array([1.0, 6.0, 4.0])
    lat = np.array([1.0, 6.0, 4.0])
    assert _points_in_ring(lon, lat, ring).tolist() == [True, False, True]


def test_admin_rects_disjoint_and_hot():
    rects = corpus.admin_rects()
    assert len(rects) == 32
    base = [r for r in rects if int(r["adm_id"][3:]) < 28]
    for a in range(len(base)):
        for b in range(a + 1, len(base)):
            ra, rb = base[a], base[b]
            sep = (
                ra["max_lon"] <= rb["min_lon"]
                or rb["max_lon"] <= ra["min_lon"]
                or ra["max_lat"] <= rb["min_lat"]
                or rb["max_lat"] <= ra["min_lat"]
            )
            assert sep, f"{ra['adm_id']} overlaps {rb['adm_id']}"
    hot = [r for r in rects if int(r["adm_id"][3:]) >= 28]
    # all four hot rects share a common region (induces skew)
    assert max(r["min_lon"] for r in hot) < min(r["max_lon"] for r in hot)
    assert max(r["min_lat"] for r in hot) < min(r["max_lat"] for r in hot)


def test_orientation_flip_normalization(spark):
    """F3: a lon-descending corpus (mirrored pixel rows + orientation
    flags) must produce pixel-level zonal stats identical to the canonical
    corpus once the kernel flip-normalizes; ignoring the flags diverges."""
    from ds_raster_pipelines_spark.operators.raster import zonal_pixel_stats

    ids = spark.range(0, 400).withColumnRenamed("id", "i")
    # fractional admin bounds: rect edges cut tile interiors, so pixel
    # windows are partial and position-sensitive (integer bounds see only
    # full windows, which are mirror-invariant — the flip would be hidden)
    adm = corpus.admin_df(spark, offset=0.07)
    canon = corpus.footprint_cols_for_images(corpus.images_from_ids(ids))
    flip = corpus.footprint_cols_for_images(
        corpus.images_from_ids(ids, orientation="flip_lon")
    )
    a = zonal_pixel_stats(canon, adm, res=6).toPandas()
    b = zonal_pixel_stats(flip, adm, res=6).toPandas()
    assert a.equals(b)
    # a reader that drops the orientation flags sees mirrored gradients
    c = zonal_pixel_stats(
        flip.drop("lon_ascending", "lat_descending"), adm, res=6
    ).toPandas()
    assert not a["px_sum"].equals(c["px_sum"])
