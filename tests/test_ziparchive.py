"""From-scratch zip container codec tests — ziparchive.py (S11).

The strongest evidence the writer emits REAL zip files: the stdlib
``zipfile`` module (an independent implementation of the same public
PKWARE format) reads our archives, and we read its.
"""

from __future__ import annotations

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ds_raster_pipelines_spark import ziparchive as za

MEMBERS = [
    ("a/x_20240101.tif", b"hello world" * 50),
    ("y_20240102.tif", b"\x01\x02\x03"),
    ("empty.txt", b""),
]


def test_roundtrip_and_determinism():
    blob = za.encode_zip(MEMBERS)
    assert za.decode_zip(blob) == {n: p for n, p in MEMBERS}
    assert blob == za.encode_zip(MEMBERS)  # bit-identical re-encode


def test_stdlib_reads_our_archives():
    blob = za.encode_zip(MEMBERS)
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.namelist() == [n for n, _ in MEMBERS]
    for n, p in MEMBERS:
        assert zf.read(n) == p
    assert zf.testzip() is None  # every CRC verifies


def test_we_read_stdlib_archives():
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("m1.bin", b"A" * 1000)  # compressible -> deflate
        z.writestr("m2.bin", b"\xff")  # tiny -> stored
    assert za.decode_zip(bio.getvalue()) == {"m1.bin": b"A" * 1000, "m2.bin": b"\xff"}


def test_selective_member_read_and_crc():
    blob = za.encode_zip(MEMBERS)
    ms = za.list_members(blob)
    assert za.read_member(blob, ms[1]) == b"\x01\x02\x03"
    bad = bytearray(blob)
    bad[50] ^= 0xFF  # inside the first member's deflate stream
    with pytest.raises(ValueError, match="CRC|invalid"):
        za.decode_zip(bytes(bad))


def test_eocd_backwards_scan_tolerates_trailing_bytes():
    # archives fetched over sloppy HTTP ranges can carry trailing junk;
    # the EOCD must be found by scanning backwards
    blob = za.encode_zip(MEMBERS) + b"trailing comment bytes"
    assert za.decode_zip(blob) == {n: p for n, p in MEMBERS}


def test_not_a_zip():
    with pytest.raises(ValueError, match="zip"):
        za.list_members(b"definitely not a zip file")


@settings(max_examples=25, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=500), min_size=1, max_size=8),
    compress=st.booleans(),
)
def test_roundtrip_property(payloads, compress):
    members = [(f"m{k}.bin", p) for k, p in enumerate(payloads)]
    blob = za.encode_zip(members, compress=compress)
    assert za.decode_zip(blob) == {n: p for n, p in members}
    # stdlib agrees on every member
    zf = zipfile.ZipFile(io.BytesIO(blob))
    for n, p in members:
        assert zf.read(n) == p


def test_spark_explode_members(spark):
    """The Arrow kernel path: archives as binary rows -> member rows."""
    import pandas as pd

    from ds_raster_pipelines_spark.sources.archives import (
        build_monthly_archives,
        explode_zip_members,
    )

    months = spark.createDataFrame(
        pd.DataFrame({"m": pd.to_datetime(["2024-01-01", "2024-02-01"])})
    )
    archives = build_monthly_archives(months)
    out = explode_zip_members(archives, verify_payload_date=True).toPandas()
    # Jan has 31 members, Feb 2024 (leap) 29
    counts = out.groupby("archive")["member_name"].count().to_dict()
    assert counts == {"2024-01": 31, "2024-02": 29}
    # member_size = 10 * day-of-month (payload = ISO string x day)
    jan1 = out[out["member_name"].str.contains("20240101")]
    assert jan1["member_size"].tolist() == [10]
    feb29 = out[out["member_name"].str.contains("20240229")]
    assert feb29["member_size"].tolist() == [290]


def test_maximal_non_zip64_member_count_parses():
    # 0xFFFF members is legal WITHOUT zip64; only a zip64 EOCD locator
    # before the EOCD means "count overflowed". ADVICE r4 boundary fix.
    blob = za.encode_zip([(f"m{i:05d}", b"") for i in range(0xFFFF)], compress=False)
    members = za.list_members(blob)
    assert len(members) == 0xFFFF
    # stdlib agrees the archive is valid
    assert len(zipfile.ZipFile(io.BytesIO(blob)).namelist()) == 0xFFFF


def test_zip64_locator_rejected():
    blob = za.encode_zip(MEMBERS)
    k = blob.rfind(b"PK\x05\x06")
    # splice a fake zip64 EOCD locator immediately before the EOCD
    fake = blob[:k] + b"PK\x06\x07" + b"\x00" * 16 + blob[k:]
    with pytest.raises(NotImplementedError):
        za.list_members(fake)
