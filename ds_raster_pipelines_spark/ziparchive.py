"""From-scratch ZIP container codec (store + deflate) — stdlib zlib only.

The reference's FloodScan feed ships rolling 90-day archives as real zip
files and explodes them member-by-member (floodscan_pipeline.py:184-218:
``ZipFile.namelist`` → per-member date parse → selective ``extract``).
This module implements the PUBLIC PKWARE APPNOTE wire format directly —
same pattern as tiff.py / netcdf.py: no dependency beyond ``zlib``.

Implemented:

* Writer: local file headers + central directory + EOCD, deflate (raw,
  wbits=-15) or stored members, CRC-32, deterministic DOS timestamps
  derived from caller input (bit-identical archives for identical input —
  required for checksum-based lineage).
* Reader: EOCD located by backwards scan (tolerates trailing comments),
  members indexed via the CENTRAL directory (the authoritative index —
  local headers alone mis-handle removed/duplicate entries), CRC-checked
  extraction, selective single-member reads without touching other
  members' compressed data.

Not implemented (raises): zip64 (>4 GiB / >65535 members), encryption,
compression methods other than store(0)/deflate(8). At warehouse scale an
archive blob bigger than 4 GiB should be re-sharded upstream anyway —
one blob must fit an Arrow batch slot.
"""

from __future__ import annotations

import struct
import zlib

_LOCAL_SIG = b"PK\x03\x04"
_CDIR_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"

STORE, DEFLATE = 0, 8


def _dos_datetime(year: int, month: int, day: int, hh: int = 0, mm: int = 0) -> tuple[int, int]:
    """MS-DOS packed (time, date) — the zip header's timestamp fields."""
    if year < 1980:
        year = 1980
    return (hh << 11) | (mm << 5), ((year - 1980) << 9) | (month << 5) | day


def encode_zip(
    members: list[tuple[str, bytes]],
    compress: bool = True,
    stamp: tuple[int, int, int] = (1980, 1, 1),
) -> bytes:
    """Serialize (name, payload) members into one zip archive.

    Deflate is used only when it actually shrinks the payload (the spec
    allows per-member methods; tiny/incompressible members stay stored).
    ``stamp`` fixes every header timestamp — archives are a pure function
    of their inputs.
    """
    dt, dd = _dos_datetime(*stamp)
    out = bytearray()
    central = bytearray()
    entries = []  # (name_bytes, method, crc, comp_len, raw_len, offset)
    for name, payload in members:
        raw = bytes(payload)
        crc = zlib.crc32(raw) & 0xFFFFFFFF
        comp = raw
        method = STORE
        if compress:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            d = c.compress(raw) + c.flush()
            if len(d) < len(raw):
                comp, method = d, DEFLATE
        nb = name.encode()
        if len(raw) > 0xFFFFFFFF or len(comp) > 0xFFFFFFFF:
            raise ValueError("zip64 not supported (member exceeds 4 GiB)")
        entries.append((nb, method, crc, len(comp), len(raw), len(out)))
        out += _LOCAL_SIG + struct.pack(
            "<HHHHHIIIHH", 20, 0, method, dt, dd, crc, len(comp), len(raw), len(nb), 0
        )
        out += nb + comp
    cdir_start = len(out)
    for nb, method, crc, comp_len, raw_len, off in entries:
        central += _CDIR_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII",
            20, 20, 0, method, dt, dd, crc, comp_len, raw_len,
            len(nb), 0, 0, 0, 0, 0, off,
        )
        central += nb
    n = len(members)
    if n > 0xFFFF:
        raise ValueError("zip64 not supported (>65535 members)")
    out += central
    out += _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, n, n, len(central), cdir_start, 0
    )
    return bytes(out)


class ZipMember:
    __slots__ = ("name", "method", "crc", "comp_size", "size", "header_offset")

    def __init__(self, name, method, crc, comp_size, size, header_offset):
        self.name = name
        self.method = method
        self.crc = crc
        self.comp_size = comp_size
        self.size = size
        self.header_offset = header_offset


def list_members(buf: bytes) -> list[ZipMember]:
    """Parse the central directory (located via a backwards EOCD scan)."""
    tail = buf[-(0xFFFF + 22):] if len(buf) > 0xFFFF + 22 else buf
    k = tail.rfind(_EOCD_SIG)
    if k < 0:
        raise ValueError("not a zip archive (no end-of-central-directory)")
    eocd_pos = len(buf) - len(tail) + k
    _, _, n, n_total, cd_size, cd_off, _ = struct.unpack_from("<HHHHIIH", buf, eocd_pos + 4)
    # n == 0xFFFF is a LEGAL member count for a non-zip64 archive (this
    # writer and stdlib zipfile both emit it); it means zip64 only when a
    # zip64 EOCD *locator* record actually precedes the EOCD.
    zip64_locator = eocd_pos >= 20 and buf[eocd_pos - 20 : eocd_pos - 16] == b"PK\x06\x07"
    if n != n_total or cd_off == 0xFFFFFFFF or zip64_locator:
        raise NotImplementedError("zip64 / multi-disk archives not supported")
    pos = cd_off
    out = []
    for _ in range(n):
        if buf[pos : pos + 4] != _CDIR_SIG:
            raise ValueError("corrupt central directory")
        (_, _, _, method, _, _, crc, csize, usize,
         nlen, elen, clen, _, _, _, off) = struct.unpack_from("<HHHHHHIIIHHHHHII", buf, pos + 4)
        name = buf[pos + 46 : pos + 46 + nlen].decode()
        out.append(ZipMember(name, method, crc, csize, usize, off))
        pos += 46 + nlen + elen + clen
    return out


def read_member(buf: bytes, member: ZipMember) -> bytes:
    """Extract ONE member's payload (CRC-verified) without touching any
    other member's compressed bytes — the selective-extract path the
    reference uses to pull only wanted dates from a 90-day archive."""
    pos = member.header_offset
    if buf[pos : pos + 4] != _LOCAL_SIG:
        raise ValueError(f"corrupt local header for {member.name!r}")
    nlen, elen = struct.unpack_from("<HH", buf, pos + 26)
    data_off = pos + 30 + nlen + elen
    comp = buf[data_off : data_off + member.comp_size]
    if member.method == STORE:
        raw = comp
    elif member.method == DEFLATE:
        raw = zlib.decompress(comp, -15)
    else:
        raise NotImplementedError(f"compression method {member.method} not supported")
    if (zlib.crc32(raw) & 0xFFFFFFFF) != member.crc:
        raise ValueError(f"CRC mismatch in member {member.name!r}")
    return raw


def decode_zip(buf: bytes) -> dict[str, bytes]:
    """All members, CRC-verified: {name: payload}."""
    return {m.name: read_member(buf, m) for m in list_members(buf)}
