"""From-scratch HDF5 / NetCDF-4 codec tests — hdf5.py (the reference's
IMERG .nc4 ingest container, imerg_pipeline.py:78).

No HDF5 library exists in this container, so evidence comes from three
directions: (1) byte-level conformance checks against the public HDF5
File Format Specification (signature, superblock v0 field offsets, v1
object-header message framing, TREE/SNOD/HEAP signatures), (2) property
tests round-tripping random schemas through the writer+reader, and
(3) a hand-built SECOND flavor of the format — superblock v3 + version-2
('OHDR') object headers + compact Link messages, the layout netcdf-c /
h5py emit since HDF5 1.10 — that the reader must also decode, proving it
is not merely the writer's inverse."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ds_raster_pipelines_spark import hdf5


def test_signature_and_superblock_v0_layout():
    blob = hdf5.encode_hdf5({"x": np.arange(5, dtype=np.int32)})
    assert blob[:8] == b"\x89HDF\r\n\x1a\n"
    assert blob[8] == 0  # superblock version 0
    assert blob[13] == 8 and blob[14] == 8  # sizes of offsets/lengths
    (leaf_k, internal_k) = struct.unpack_from("<HH", blob, 16)
    assert leaf_k == 4 and internal_k == 16
    (base, _fs, eof, _drv) = struct.unpack_from("<QQQQ", blob, 24)
    assert base == 0 and eof == len(blob)
    # structure signatures present exactly where the group machinery needs
    assert b"TREE" in blob and b"SNOD" in blob and b"HEAP" in blob


def test_roundtrip_contiguous_and_chunked_filters():
    rng = np.random.default_rng(1)
    a = rng.integers(-1000, 1000, size=(13, 7)).astype(np.int16)
    b = rng.normal(size=(5, 6, 4)).astype(np.float64)
    blob = hdf5.encode_hdf5(
        {"a": a, "b": b},
        attrs={"a": {"units": "K"}, "b": {"scale": np.float32(2.5)}},
        global_attrs={"title": "t"},
        chunks={"b": (2, 6, 3)},  # ragged edge chunks on dims 0 and 2
        deflate=6,
        shuffle=True,
    )
    f = hdf5.decode_hdf5(blob)
    assert np.array_equal(f.datasets["a"].data, a)
    assert np.array_equal(f.datasets["b"].data, b)
    assert f.datasets["a"].attrs["units"] == "K"
    assert f.datasets["b"].attrs["scale"] == np.float32(2.5)
    assert f.attrs["title"] == "t"
    # deflate actually ran: the raw float64 bytes must not appear verbatim
    assert b.tobytes() not in blob


def test_big_endian_input_normalized():
    d = np.arange(6, dtype=">i4").reshape(2, 3)
    f = hdf5.decode_hdf5(hdf5.encode_hdf5({"x": d}))
    assert np.array_equal(f.datasets["x"].data, d.astype("<i4"))


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    nds=st.integers(1, 4),
    use_chunks=st.booleans(),
    deflate=st.sampled_from([None, 1, 6]),
)
def test_roundtrip_property(seed, nds, use_chunks, deflate):
    rng = np.random.default_rng(seed)
    dts = [np.uint8, np.int16, np.int32, np.int64, np.float32, np.float64]
    datasets, chunks = {}, {}
    for k in range(nds):
        rank = int(rng.integers(1, 4))
        shape = tuple(int(rng.integers(1, 9)) for _ in range(rank))
        dt = dts[int(rng.integers(0, len(dts)))]
        a = rng.integers(0, 100, size=shape).astype(dt)
        name = f"v{k}"
        datasets[name] = a
        if use_chunks:
            chunks[name] = tuple(max(1, s // 2) for s in shape)
    blob = hdf5.encode_hdf5(
        datasets, chunks=chunks if use_chunks else None, deflate=deflate,
        shuffle=use_chunks,
    )
    f = hdf5.decode_hdf5(blob)
    assert set(f.datasets) == set(datasets)
    for name, a in datasets.items():
        got = f.datasets[name]
        assert got.shape == a.shape
        assert np.array_equal(got.data, a)


def test_nc4_tile_roundtrip_and_georeferencing():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    blob = hdf5.encode_nc4_tile(px, lon0=-77.25, lat_top=38.5, span_deg=0.25, date_days=41)
    assert np.array_equal(hdf5.decode_nc4_tile(blob), px)
    f = hdf5.decode_hdf5(blob)
    # the real IMERG layout: every variable lives under a Grid group
    assert set(f.datasets) == {"Grid/time", "Grid/lat", "Grid/lon", "Grid/band_data"}
    assert f.datasets["Grid/lat"].attrs["CLASS"] == "DIMENSION_SCALE"
    assert f.datasets["Grid/time"].data[0] == 41
    step = 0.25 / 64
    assert abs(f.datasets["Grid/lon"].data[0] - (-77.25 + 0.5 * step)) < 1e-12
    assert abs(f.datasets["Grid/lat"].data[0] - (38.5 - 0.5 * step)) < 1e-12
    # lat strictly descending: the reference's north-up convention
    assert (np.diff(f.datasets["Grid/lat"].data) < 0).all()


def test_rejects_garbage_and_unknown_layouts():
    with pytest.raises(ValueError, match="signature"):
        hdf5.decode_hdf5(b"not an hdf5 file" * 4)
    blob = bytearray(hdf5.encode_hdf5({"x": np.arange(3, dtype=np.int32)}))
    blob[8] = 1  # superblock version 1
    with pytest.raises(NotImplementedError, match="superblock version"):
        hdf5.decode_hdf5(bytes(blob))


# ------------- second flavor: superblock v3 + OHDR + compact links ---------


def _v2_header(messages: list[tuple[int, bytes]], with_times: bool = False) -> bytes:
    """Version-2 object header ('OHDR'), 1-byte message types, trailing
    checksum field (value unchecked by our reader, as allowed)."""
    blob = b"".join(
        struct.pack("<BHB", t, len(body), 0) + body for t, body in messages
    )
    flags = 0x01  # chunk0 size field is 2 bytes (1 << 1)
    head = b"OHDR" + struct.pack("<BB", 2, flags | (0x20 if with_times else 0))
    if with_times:
        head += struct.pack("<4I", 1, 2, 3, 4)
    head += struct.pack("<H", len(blob))
    return head + blob + struct.pack("<I", 0)


def _link_msg(name: str, hdr_addr: int) -> bytes:
    nm = name.encode()
    return struct.pack("<BBB", 1, 0, len(nm)) + nm + struct.pack("<Q", hdr_addr)


def test_reader_handles_v2_ohdr_compact_link_flavor():
    """Hand-assemble the OTHER public layout (netcdf-c/h5py >=1.10):
    superblock v3, OHDR object headers with timestamps, compact Link
    messages instead of symbol tables. The reader must decode it even
    though the writer never emits it."""
    a = np.arange(24, dtype=np.float32).reshape(4, 6)
    out = bytearray(b"\x00" * 48)  # superblock v3 is 48 bytes

    def alloc(b: bytes) -> int:
        pad = (-len(out)) % 8
        out.extend(b"\x00" * pad)
        addr = len(out)
        out.extend(b)
        return addr

    data_addr = alloc(a.tobytes())
    ds_msgs = [
        (0x01, hdf5._ds_message(a.shape)),
        (0x03, hdf5._dt_message(a.dtype)),
        (0x08, struct.pack("<BBQQ", 3, 1, data_addr, a.nbytes)),
        (0x0C, hdf5._attr_message("units", "mm/h")),
    ]
    ds_hdr = alloc(_v2_header(ds_msgs, with_times=True))
    root_hdr = alloc(
        _v2_header(
            [
                (0x06, _link_msg("precip", ds_hdr)),
                (0x0C, hdf5._attr_message("Conventions", "CF-1.6")),
            ]
        )
    )
    sb = (
        hdf5._SIG
        + struct.pack("<BBBB", 3, 8, 8, 0)
        + struct.pack("<QQQQ", 0, hdf5._UNDEF, len(out), root_hdr)
        + struct.pack("<I", 0)  # checksum (unchecked)
    )
    out[: len(sb)] = sb

    f = hdf5.decode_hdf5(bytes(out))
    assert set(f.datasets) == {"precip"}
    assert np.array_equal(f.datasets["precip"].data, a)
    assert f.datasets["precip"].attrs["units"] == "mm/h"
    assert f.attrs["Conventions"] == "CF-1.6"


def test_v2_continuation_blocks():
    """OHDR continuation ('OCHK') blocks chain messages across chunks."""
    a = np.arange(10, dtype=np.int32)
    out = bytearray(b"\x00" * 48)

    def alloc(b: bytes) -> int:
        pad = (-len(out)) % 8
        out.extend(b"\x00" * pad)
        addr = len(out)
        out.extend(b)
        return addr

    data_addr = alloc(a.tobytes())
    tail_msgs = b"".join(
        struct.pack("<BHB", t, len(body), 0) + body
        for t, body in [
            (0x08, struct.pack("<BBQQ", 3, 1, data_addr, a.nbytes)),
        ]
    )
    cont_addr = alloc(b"OCHK" + tail_msgs + struct.pack("<I", 0))
    head_msgs = [
        (0x01, hdf5._ds_message(a.shape)),
        (0x03, hdf5._dt_message(a.dtype)),
        (0x10, struct.pack("<QQ", cont_addr, len(tail_msgs) + 8)),
    ]
    ds_hdr = alloc(_v2_header(head_msgs))
    root_hdr = alloc(_v2_header([(0x06, _link_msg("x", ds_hdr))]))
    sb = (
        hdf5._SIG
        + struct.pack("<BBBB", 3, 8, 8, 0)
        + struct.pack("<QQQQ", 0, hdf5._UNDEF, len(out), root_hdr)
        + struct.pack("<I", 0)
    )
    out[: len(sb)] = sb
    f = hdf5.decode_hdf5(bytes(out))
    assert np.array_equal(f.datasets["x"].data, a)


def test_nested_groups_roundtrip():
    """Datasets at mixed depths: root-level, one group, two levels —
    each group gets its own heap/SNOD/B-tree; reader slash-joins names."""
    a = np.arange(4, dtype=np.int32)
    b = np.arange(6, dtype=np.float64).reshape(2, 3)
    c = np.arange(8, dtype=np.int16)
    f = hdf5.decode_hdf5(
        hdf5.encode_hdf5({"root_ds": a, "G/inner": b, "G/H/deep": c})
    )
    assert set(f.datasets) == {"root_ds", "G/inner", "G/H/deep"}
    assert np.array_equal(f.datasets["G/inner"].data, b)
    assert np.array_equal(f.datasets["G/H/deep"].data, c)


def test_nc4_cf_packed_roundtrip_exact():
    """Packed shorts + shuffle + deflate in the HDF5 container decode
    bit-exactly (the real-IMERG on-disk layout)."""
    import numpy as np

    from ds_raster_pipelines_spark import hdf5

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    blob = hdf5.encode_nc4_tile_packed(px, lon0=-30.0, lat_top=10.0)
    assert np.array_equal(hdf5.decode_nc4_tile(blob), px)
    # packed short payload deflates well below the float32 plain twin
    assert len(blob) < len(hdf5.encode_nc4_tile(px, lon0=-30.0, lat_top=10.0))


def test_encode_hdf5_group_dataset_name_collision_both_orders():
    import numpy as np
    import pytest

    from ds_raster_pipelines_spark.hdf5 import encode_hdf5

    a = np.zeros(4, dtype=np.int32)
    with pytest.raises(ValueError):
        encode_hdf5(datasets={"Grid/x": a, "Grid": a})  # dataset after group
    with pytest.raises(ValueError):
        encode_hdf5(datasets={"Grid": a, "Grid/x": a})  # group after dataset


def test_structural_template_memo_parity():
    """r8: decode_hdf5's structural-template memo must be value-identical
    to full parses over tiles that differ in payloads, coordinates and
    chunk sizes — including the packed variant (attrs drive cf_unpack)."""
    import numpy as np

    import ds_raster_pipelines_spark.hdf5 as H
    from ds_raster_pipelines_spark import corpus, hdf5

    blobs = [
        hdf5.encode_nc4_tile(
            corpus.pixels_for(i), lon0=i * 0.1, lat_top=i * 0.05, date_days=i
        )
        for i in range(0, 97, 5)
    ] + [
        hdf5.encode_nc4_tile_packed(corpus.pixels_for(i), lon0=i * 0.2)
        for i in range(0, 97, 9)
    ]
    refs = []
    for b in blobs:
        H._H5_TEMPLATES.clear()  # force a full parse
        refs.append(hdf5.decode_hdf5(b))
    H._H5_TEMPLATES.clear()
    got = [hdf5.decode_hdf5(b) for b in blobs]  # warm: memo hits
    for f_ref, f_got in zip(refs, got):
        assert set(f_ref.datasets) == set(f_got.datasets)
        for name, d_ref in f_ref.datasets.items():
            d_got = f_got.datasets[name]
            assert np.array_equal(d_ref.data, d_got.data), name
            assert d_ref.attrs == d_got.attrs, name
        assert f_ref.attrs == f_got.attrs
