"""From-scratch classic NetCDF-3 (CDF-1) codec tests — netcdf.py.

The reference ingests .nc/.nc4 via xarray (imerg_pipeline.py:78,
floodscan_pipeline.py:223,355); these tests pin the container format
itself: header layout, record interleaving, byte order, padding rules.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ds_raster_pipelines_spark import netcdf as nc


def test_header_bytes_conform_to_spec():
    """Hand-check the wire format of a minimal file against the public
    Unidata classic-format spec: magic, numrecs, dim/attr/var list tags,
    name padding, big-endian values."""
    b = nc.encode_nc(
        dims={"x": 2},
        variables=[nc.NcVar("v", ("x",), np.array([258, -2], dtype=np.int32))],
    )
    assert b[:4] == b"CDF\x01"
    assert struct.unpack_from(">I", b, 4) == (0,)  # numrecs
    # dim_list: NC_DIMENSION tag, 1 dim, name "x" padded to 4, size 2
    assert struct.unpack_from(">ii", b, 8) == (0x0A, 1)
    assert struct.unpack_from(">i", b, 16) == (1,)  # namelen
    assert b[20:21] == b"x" and b[21:24] == b"\x00\x00\x00"
    assert struct.unpack_from(">i", b, 24) == (2,)  # dim size
    # gatt_list ABSENT, var_list NC_VARIABLE + 1
    assert struct.unpack_from(">ii", b, 28) == (0, 0)
    assert struct.unpack_from(">ii", b, 36) == (0x0B, 1)
    # data section: two big-endian int32s at the var's begin offset
    (begin,) = struct.unpack(">I", b[-12:-8])
    assert b[begin : begin + 8] == struct.pack(">ii", 258, -2)


def test_roundtrip_all_types_and_attrs():
    b = nc.encode_nc(
        dims={"x": 3, "y": 2},
        variables=[
            nc.NcVar("i8", ("x",), np.array([-1, 0, 127], dtype=np.int8)),
            nc.NcVar("i16", ("x",), np.array([-300, 0, 300], dtype=np.int16)),
            nc.NcVar("i32", ("x",), np.array([-70000, 0, 70000], dtype=np.int32)),
            nc.NcVar("f4", ("x",), np.array([0.5, -1.25, 3.0], dtype=np.float32)),
            nc.NcVar("f8", ("y", "x"), np.arange(6, dtype=np.float64).reshape(2, 3) / 7),
            nc.NcVar("scalar", (), np.array(9, dtype=np.int32)),
            nc.NcVar("u8", ("x",), np.array([0, 128, 255], dtype=np.uint8)),
        ],
        global_attrs={"title": "t", "vals": np.array([1.5, 2.5]), "n": np.int32(3)},
    )
    f = nc.decode_nc(b)
    assert f.variables["i8"].data.tolist() == [-1, 0, 127]
    assert f.variables["i16"].data.tolist() == [-300, 0, 300]
    assert f.variables["i32"].data.tolist() == [-70000, 0, 70000]
    assert f.variables["f4"].data.tolist() == [0.5, -1.25, 3.0]
    assert np.array_equal(f.variables["f8"].data, np.arange(6).reshape(2, 3) / 7)
    assert f.variables["scalar"].data == 9
    # uint8 stores as NC_BYTE (signed); reads back via the view convention
    assert f.variables["u8"].data.view(np.uint8).tolist() == [0, 128, 255]
    assert f.attrs == {"title": "t", "vals": f.attrs["vals"], "n": 3}
    assert f.attrs["vals"].tolist() == [1.5, 2.5]


def test_record_dim_interleaving_and_special_case():
    # two record vars -> per-record 4-byte padding
    b = nc.encode_nc(
        dims={"t": 4, "x": 3},
        variables=[
            nc.NcVar("v", ("t", "x"), np.arange(12, dtype=np.int16).reshape(4, 3)),
            nc.NcVar("w", ("t",), np.arange(4, dtype=np.float64)),
        ],
        record_dim="t",
    )
    f = nc.decode_nc(b)
    assert np.array_equal(f.variables["v"].data, np.arange(12).reshape(4, 3))
    assert f.variables["w"].data.tolist() == [0.0, 1.0, 2.0, 3.0]
    assert f.record_dim == "t" and f.dims == {"t": 4, "x": 3}
    # one small-type record var -> spec's tight packing (no padding):
    # 4 records x 3 int16 = 24 bytes of record data exactly
    b2 = nc.encode_nc(
        dims={"t": 4, "x": 3},
        variables=[nc.NcVar("v", ("t", "x"), np.arange(12, dtype=np.int16).reshape(4, 3))],
        record_dim="t",
    )
    f2 = nc.decode_nc(b2)
    assert np.array_equal(f2.variables["v"].data, np.arange(12).reshape(4, 3))
    # header ends with the var's begin offset; 4 records x 3 int16 = 24
    # tightly-packed data bytes follow (6 bytes/record, NOT padded to 8)
    (begin,) = struct.unpack(">I", b2[-28:-24])
    assert begin == len(b2) - 24
    assert b2[begin : begin + 6] == struct.pack(">3h", 0, 1, 2)


def test_streaming_numrecs_sentinel():
    b = nc.encode_nc(
        dims={"t": 5, "x": 2},
        variables=[nc.NcVar("v", ("t", "x"), np.arange(10, dtype=np.int32).reshape(5, 2))],
        record_dim="t",
    )
    streaming = b[:4] + b"\xff\xff\xff\xff" + b[8:]
    f = nc.decode_nc(streaming)
    assert np.array_equal(f.variables["v"].data, np.arange(10).reshape(5, 2))


def test_rejects_netcdf4_and_garbage():
    with pytest.raises(NotImplementedError, match="NetCDF-4"):
        nc.decode_nc(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="classic"):
        nc.decode_nc(b"not a netcdf file at all")


def test_tile_container_embeds_true_georeferencing():
    """The corpus 'nc' blobs carry REAL coordinate variables: a consumer
    reading lat/lon from the container itself must land on the same grid
    as the footprint columns (corpus.footprint_cols_for_images)."""
    i = 12345
    lon0 = -180.0 + 0.25 * ((i * 13) % 1440)
    lat_top = 90.0 - 0.25 * ((i * 7) % 720)
    px = ((np.arange(64)[None, :] + i % 97) % 256).astype(np.uint8).repeat(64, axis=0)
    b = nc.encode_nc_tile(px, lon0=lon0, lat_top=lat_top, date_days=i % 366)
    f = nc.decode_nc(b)
    step = 0.25 / 64
    assert np.allclose(f.variables["lon"].data, lon0 + (np.arange(64) + 0.5) * step)
    assert np.allclose(f.variables["lat"].data, lat_top - (np.arange(64) + 0.5) * step)
    assert f.variables["lat"].data[0] > f.variables["lat"].data[-1]  # north-up
    assert f.variables["time"].data[0] == i % 366
    assert np.array_equal(nc.decode_nc_tile(b), px)
    assert f.variables["band_data"].data.dtype == np.float32  # V3 dtype gate


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 9),
    w=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
)
def test_tile_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    span = 0.25
    b = nc.encode_nc_tile(px, lon0=-10.0, lat_top=45.0, span_deg=span)
    assert np.array_equal(nc.decode_nc_tile(b), px)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_fixed=st.integers(1, 3),
    n_vars=st.integers(1, 4),
    with_record=st.booleans(),
)
def test_encode_nc_roundtrip_property(seed, n_fixed, n_vars, with_record):
    """Random schemas: arbitrary fixed dims, optional record dim, mixed
    external types — encode_nc/decode_nc round-trip values, dims, and
    attrs exactly."""
    rng = np.random.default_rng(seed)
    dims = {f"d{k}": int(rng.integers(1, 5)) for k in range(n_fixed)}
    record = None
    if with_record:
        record = "t"
        dims = {"t": int(rng.integers(1, 4)), **dims}
    dtypes = [np.int8, np.int16, np.int32, np.float32, np.float64]
    variables = []
    for v in range(n_vars):
        nd = int(rng.integers(0, min(2, len(dims)) + 1))
        pool = [d for d in dims if d != record]
        vdims = list(rng.choice(pool, size=min(nd, len(pool)), replace=False))
        if record is not None and rng.random() < 0.5:
            vdims = [record] + vdims
        shape = tuple(dims[d] for d in vdims)
        dt = dtypes[int(rng.integers(len(dtypes)))]
        if np.issubdtype(dt, np.integer):
            data = rng.integers(-100, 100, size=shape).astype(dt)
        else:
            data = (rng.integers(-800, 800, size=shape) / 4.0).astype(dt)
        variables.append(nc.NcVar(f"v{v}", tuple(vdims), data, {"k": np.int32(v)}))
    blob = nc.encode_nc(dims, variables, {"title": "prop"}, record_dim=record)
    f = nc.decode_nc(blob)
    assert f.dims == dims and f.record_dim == record
    for var in variables:
        got = f.variables[var.name]
        assert got.dims == var.dims
        assert np.array_equal(got.data, var.data), var.name
        assert got.attrs == {"k": var.attrs["k"]}


def test_encode_rejects_int64_overflow():
    """int64 data/attrs that do not fit NC_INT must raise, not wrap
    (ADVICE r4: direct encode_nc callers bypassed the sink's guard)."""
    big = np.array([1, 2 ** 40], dtype=np.int64)
    with pytest.raises(ValueError, match="NC_INT range"):
        nc.encode_nc({"x": 2}, [nc.NcVar("v", ("x",), big)])
    with pytest.raises(ValueError, match="NC_INT range"):
        nc.encode_nc({"x": 1}, [nc.NcVar("v", ("x",), np.zeros(1, np.int64), {"a": np.int64(2 ** 40)})])
    # in-range int64 still encodes (as NC_INT)
    ok = nc.encode_nc({"x": 2}, [nc.NcVar("v", ("x",), np.array([1, 2], np.int64))])
    assert np.array_equal(nc.decode_nc(ok).variables["v"].data, [1, 2])


def test_cf_packed_roundtrip_exact():
    """CF packed-variable convention (scale_factor/add_offset shorts):
    unpack must be integer-exact for uint8 pixels at the default
    (0.25, 128.0) packing, via both the full parse and the header-template
    memo path."""
    import numpy as np

    from ds_raster_pipelines_spark import netcdf

    netcdf._TILE_TEMPLATES.clear()
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    blob = netcdf.encode_nc_tile_packed(px, lon0=12.0, lat_top=48.0)
    assert np.array_equal(netcdf.decode_nc_tile(blob), px)  # full parse
    px2 = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    blob2 = netcdf.encode_nc_tile_packed(px2, lon0=12.0, lat_top=48.0)
    assert len(netcdf._TILE_TEMPLATES) == 1
    assert np.array_equal(netcdf.decode_nc_tile(blob2), px2)  # memo path


def test_cf_unpack_fill_value_and_partial_attrs():
    import numpy as np

    from ds_raster_pipelines_spark.netcdf import cf_unpack

    a = np.array([-999, 0, 4], dtype=np.int16)
    out = cf_unpack(a, {"scale_factor": 0.5, "add_offset": 10.0, "_FillValue": -999})
    assert np.isnan(out[0]) and out[1] == 10.0 and out[2] == 12.0
    # scale only / offset only
    assert cf_unpack(np.array([4], dtype=np.int16), {"scale_factor": 2.0})[0] == 8.0
    assert cf_unpack(np.array([4], dtype=np.int16), {"add_offset": 1.0})[0] == 5.0
    # no attrs -> untouched dtype
    assert cf_unpack(a, {}).dtype == np.int16
