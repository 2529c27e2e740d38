"""From-scratch baseline TIFF codec (stdlib + numpy only).

The reference opens real GeoTIFF/COG rasters (rioxarray at
``/root/reference/src/pipelines/floodscan_pipeline.py:384,397``) and writes
``driver="COG"`` GeoTIFFs (``/root/reference/src/pipelines/pipeline.py:277``).
This container has no imaging/GDAL libraries, so — exactly like the
from-scratch PNG codec in ``codecs.py`` — this module implements the
baseline-profile subset those flows need, spec-compliant and round-trip
bit-exact:

* grayscale 8-bit, little-endian classic TIFF;
* STRIP layout (``encode_tif``) — the plain sink;
* TILE layout + one reduced-resolution overview IFD (``encode_cog``) — the
  Cloud-Optimized-GeoTIFF shape: full-res tiles for windowed range reads,
  a 2x overview (2x2 mean) for zoomed-out reads, header-first layout;
* compression 1 (none) and 32773 (PackBits), both directions.

Decode is vectorized per image (numpy reassembly of strips/tiles); encode
runs inside Arrow-batched kernels only — never per-row Python in a hot
Spark stage.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag ids (TIFF 6.0 baseline)
T_NEW_SUBFILE = 254
T_WIDTH = 256
T_LENGTH = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_SAMPLES = 277
T_ROWS_PER_STRIP = 278
T_STRIP_COUNTS = 279
T_TILE_WIDTH = 322
T_TILE_LENGTH = 323
T_TILE_OFFSETS = 324
T_TILE_COUNTS = 325

COMP_NONE = 1
COMP_PACKBITS = 32773

_TYPE_SHORT = 3
_TYPE_LONG = 4


# ------------------------------------------------------------- PackBits ---


def packbits_encode(data: bytes) -> bytes:
    """TIFF PackBits: runs >= 3 become (-(n-1), byte); literals chunked."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literals(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(data[j : j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)  # two's complement of -(run-1)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(n)
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # replicate next byte 257-c times
            out += data[i : i + 1] * (257 - c)
            i += 1
        # c == 128: noop
    if len(out) != expected:
        raise ValueError(f"PackBits: expected {expected} bytes, got {len(out)}")
    return bytes(out)


def _compress(data: bytes, compression: int) -> bytes:
    if compression == COMP_NONE:
        return data
    if compression == COMP_PACKBITS:
        return packbits_encode(data)
    raise ValueError(f"unsupported TIFF compression {compression}")


def _decompress(data: bytes, compression: int, expected: int) -> bytes:
    if compression == COMP_NONE:
        if len(data) < expected:
            raise ValueError("truncated uncompressed segment")
        return data[:expected]
    if compression == COMP_PACKBITS:
        return packbits_decode(data, expected)
    raise ValueError(f"unsupported TIFF compression {compression}")


# --------------------------------------------------------------- writer ---


def _ifd_bytes(entries: list[tuple[int, int, int, int]], next_ifd: int) -> bytes:
    """entries = [(tag, type, count, value_or_offset)] sorted by tag."""
    out = struct.pack("<H", len(entries))
    for tag, typ, count, value in sorted(entries):
        out += struct.pack("<HHI", tag, typ, count)
        if typ == _TYPE_SHORT and count == 1:
            out += struct.pack("<HH", value, 0)
        else:
            out += struct.pack("<I", value)
    return out + struct.pack("<I", next_ifd)


def _ifd_size(n_entries: int) -> int:
    return 2 + 12 * n_entries + 4


def build_tif(ifds: list[dict], segments: list[list[bytes]]) -> bytes:
    """Serialize ``ifds`` (list of {tag: int|list[int]} with placeholder
    offsets) + per-IFD pixel ``segments``; offset tags (Strip/TileOffsets)
    are filled in here. Little-endian classic TIFF, header-first layout."""
    pos = 8
    ifd_pos = []
    for tags in ifds:
        ifd_pos.append(pos)
        pos += _ifd_size(len(tags))
    # tag arrays that spill out of the inline 4 bytes
    arrays: dict[tuple[int, int], tuple[int, bytes]] = {}
    for i, tags in enumerate(ifds):
        for tag, (typ, values) in tags.items():
            if tag in (T_STRIP_OFFSETS, T_TILE_OFFSETS):
                continue  # resolved after segment placement
            if isinstance(values, list) and len(values) > (2 if typ == _TYPE_SHORT else 1):
                fmt = "<" + ("H" if typ == _TYPE_SHORT else "I") * len(values)
                b = struct.pack(fmt, *values)
                arrays[(i, tag)] = (pos, b)
                pos += len(b)
    # offset arrays (placed even when they'd fit inline, for simplicity,
    # except single-segment IFDs which stay inline)
    off_arr_pos: dict[int, int] = {}
    for i, tags in enumerate(ifds):
        n_seg = len(segments[i])
        if n_seg > 1:
            off_arr_pos[i] = pos
            pos += 4 * n_seg
    # segments
    seg_offsets: list[list[int]] = []
    for i, segs in enumerate(segments):
        offs = []
        for s in segs:
            offs.append(pos)
            pos += len(s)
        seg_offsets.append(offs)
    # serialize
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_pos[0]))
    for i, tags in enumerate(ifds):
        entries = []
        for tag, (typ, values) in sorted(tags.items()):
            if tag in (T_STRIP_OFFSETS, T_TILE_OFFSETS):
                offs = seg_offsets[i]
                if len(offs) == 1:
                    entries.append((tag, _TYPE_LONG, 1, offs[0]))
                else:
                    entries.append((tag, _TYPE_LONG, len(offs), off_arr_pos[i]))
                continue
            vals = values if isinstance(values, list) else [values]
            if (i, tag) in arrays:
                entries.append((tag, typ, len(vals), arrays[(i, tag)][0]))
            elif typ == _TYPE_SHORT and len(vals) == 2:
                entries.append((tag, typ, 2, vals[0] | (vals[1] << 16)))
            else:
                entries.append((tag, typ, len(vals), vals[0]))
        nxt = ifd_pos[i + 1] if i + 1 < len(ifds) else 0
        out += _ifd_bytes(entries, nxt)
    for (_, _), (p, b) in sorted(arrays.items(), key=lambda kv: kv[1][0]):
        assert len(out) == p
        out += b
    for i in sorted(off_arr_pos):
        assert len(out) == off_arr_pos[i]
        out += struct.pack("<" + "I" * len(seg_offsets[i]), *seg_offsets[i])
    for i, segs in enumerate(segments):
        for off, s in zip(seg_offsets[i], segs):
            assert len(out) == off
            out += s
    return bytes(out)


def _base_tags(w: int, h: int, compression: int) -> dict:
    return {
        T_WIDTH: (_TYPE_LONG, w),
        T_LENGTH: (_TYPE_LONG, h),
        T_BITS: (_TYPE_SHORT, 8),
        T_COMPRESSION: (_TYPE_SHORT, compression),
        T_PHOTOMETRIC: (_TYPE_SHORT, 1),  # BlackIsZero
        T_SAMPLES: (_TYPE_SHORT, 1),
    }


def encode_tif(
    pixels: np.ndarray, compression: int = COMP_PACKBITS, rows_per_strip: int = 16
) -> bytes:
    """Strip-based grayscale 8-bit TIFF (the plain sink shape)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = px.shape
    strips = []
    for y0 in range(0, h, rows_per_strip):
        strips.append(_compress(px[y0 : y0 + rows_per_strip].tobytes(), compression))
    tags = _base_tags(w, h, compression)
    tags[T_ROWS_PER_STRIP] = (_TYPE_LONG, rows_per_strip)
    tags[T_STRIP_OFFSETS] = (_TYPE_LONG, 0)  # resolved by build_tif
    tags[T_STRIP_COUNTS] = (_TYPE_LONG, [len(s) for s in strips])
    return build_tif([tags], [strips])


def _tile_grid(px: np.ndarray, tw: int, th: int) -> list[bytes]:
    """Row-major tile segments, edge tiles zero-padded to (th, tw)."""
    h, w = px.shape
    segs = []
    for y0 in range(0, h, th):
        for x0 in range(0, w, tw):
            t = np.zeros((th, tw), dtype=np.uint8)
            blk = px[y0 : y0 + th, x0 : x0 + tw]
            t[: blk.shape[0], : blk.shape[1]] = blk
            segs.append(t.tobytes())
    return segs


def overview_2x(px: np.ndarray) -> np.ndarray:
    """Deterministic 2x reduced-resolution level: 2x2 block mean, truncated
    to uint8 (floor — matches integer SQL ``sum/4`` for the oracle twin)."""
    h, w = px.shape
    assert h % 2 == 0 and w % 2 == 0, "overview requires even dims"
    s = px.astype(np.uint16).reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
    return (s // 4).astype(np.uint8)


def encode_cog(
    pixels: np.ndarray,
    tile: int = 32,
    compression: int = COMP_PACKBITS,
    overviews: int = 1,
) -> bytes:
    """COG-shaped TIFF: tiled full-res IFD + ``overviews`` reduced-
    resolution tiled IFDs (NewSubfileType=1), header-first layout.
    Mirrors the reference's ``driver="COG"`` write (pipeline.py:277)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    levels = [px]
    for _ in range(overviews):
        h, w = levels[-1].shape
        if h % 2 or w % 2 or h < 2 or w < 2:  # no further clean 2x level
            break
        levels.append(overview_2x(levels[-1]))
    ifds, segments = [], []
    for lvl, lp in enumerate(levels):
        h, w = lp.shape
        tw = th = min(tile, w, h)
        segs = _tile_grid(lp, tw, th)
        segs = [_compress(s, compression) for s in segs]
        tags = _base_tags(w, h, compression)
        tags[T_TILE_WIDTH] = (_TYPE_LONG, tw)
        tags[T_TILE_LENGTH] = (_TYPE_LONG, th)
        tags[T_TILE_OFFSETS] = (_TYPE_LONG, 0)  # resolved by build_tif
        tags[T_TILE_COUNTS] = (_TYPE_LONG, [len(s) for s in segs])
        if lvl > 0:
            tags[T_NEW_SUBFILE] = (_TYPE_LONG, 1)  # reduced-resolution page
        ifds.append(tags)
        segments.append(segs)
    return build_tif(ifds, segments)


# --------------------------------------------------------------- reader ---


def _read_ifds(data: bytes) -> list[dict[int, list[int]]]:
    if data[:4] != b"II*\x00":
        raise ValueError("not a little-endian classic TIFF")
    (off,) = struct.unpack_from("<I", data, 4)
    ifds = []
    while off:
        (n,) = struct.unpack_from("<H", data, off)
        tags: dict[int, list[int]] = {}
        for k in range(n):
            tag, typ, count = struct.unpack_from("<HHI", data, off + 2 + 12 * k)
            vpos = off + 2 + 12 * k + 8
            if typ == _TYPE_SHORT:
                if count <= 2:
                    vals = list(struct.unpack_from("<" + "H" * count, data, vpos))
                else:
                    (p,) = struct.unpack_from("<I", data, vpos)
                    vals = list(struct.unpack_from("<" + "H" * count, data, p))
            elif typ == _TYPE_LONG:
                if count <= 1:
                    vals = list(struct.unpack_from("<I", data, vpos))
                else:
                    (p,) = struct.unpack_from("<I", data, vpos)
                    vals = list(struct.unpack_from("<" + "I" * count, data, p))
            else:  # tags we didn't write; skip
                continue
            tags[tag] = vals
        ifds.append(tags)
        (off,) = struct.unpack_from("<I", data, off + 2 + 12 * n)
    return ifds


def _decode_ifd(data: bytes, tags: dict[int, list[int]]) -> np.ndarray:
    w, h = tags[T_WIDTH][0], tags[T_LENGTH][0]
    comp = tags.get(T_COMPRESSION, [COMP_NONE])[0]
    if tags.get(T_BITS, [8])[0] != 8 or tags.get(T_SAMPLES, [1])[0] != 1:
        raise ValueError("only 8-bit single-sample TIFF supported")
    if T_TILE_OFFSETS in tags:
        tw, th = tags[T_TILE_WIDTH][0], tags[T_TILE_LENGTH][0]
        offs, cnts = tags[T_TILE_OFFSETS], tags[T_TILE_COUNTS]
        ntx = (w + tw - 1) // tw
        out = np.zeros(((h + th - 1) // th * th, ntx * tw), dtype=np.uint8)
        for k, (o, c) in enumerate(zip(offs, cnts)):
            raw = _decompress(data[o : o + c], comp, tw * th)
            ty, tx = divmod(k, ntx)
            out[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = np.frombuffer(
                raw, dtype=np.uint8
            ).reshape(th, tw)
        return out[:h, :w].copy()
    offs, cnts = tags[T_STRIP_OFFSETS], tags[T_STRIP_COUNTS]
    rps = tags.get(T_ROWS_PER_STRIP, [h])[0]
    rows = []
    for k, (o, c) in enumerate(zip(offs, cnts)):
        n_rows = min(rps, h - k * rps)
        raw = _decompress(data[o : o + c], comp, n_rows * w)
        rows.append(np.frombuffer(raw, dtype=np.uint8).reshape(n_rows, w))
    return np.vstack(rows)


def decode_tif(data: bytes) -> np.ndarray:
    """Decode the full-resolution page (first IFD with NewSubfileType==0)."""
    for tags in _read_ifds(data):
        if tags.get(T_NEW_SUBFILE, [0])[0] == 0:
            return _decode_ifd(data, tags)
    raise ValueError("no full-resolution IFD")


def decode_tif_overview(data: bytes, level: int = 1) -> np.ndarray:
    """Decode the ``level``-th reduced-resolution page of a COG."""
    reduced = [t for t in _read_ifds(data) if t.get(T_NEW_SUBFILE, [0])[0] == 1]
    if len(reduced) < level:
        raise ValueError(f"COG has {len(reduced)} overview levels, wanted {level}")
    return _decode_ifd(data, reduced[level - 1])


# ------------------------------------------------- ranged (partial) read ---


def decode_tif_overview_ranged(
    fetch_range, level: int = 1, probe: int = 4096, max_probe: int = 1 << 22
):
    """COG PARTIAL read — the reason the COG layout exists: decode one
    reduced-resolution page by fetching only (a) a small header prefix
    (header-first layout: magic + IFD chain + tag/offset arrays all
    precede pixel segments in build_tif) and (b) that page's own pixel
    segments, never the full-resolution bytes. ``fetch_range(offset,
    length) -> bytes`` abstracts the transport (HTTP Range / S3 ranged
    GET / local seek — sources/remote.py adapters); the reference's
    examples read SEAS5 COG windows the same way
    (examples/read_seas5_cogs.md).

    Returns (pixels, bytes_fetched). The header probe doubles until the
    IFD chain parses (the standard COG client pattern)."""
    prefix = fetch_range(0, probe)
    while True:
        try:
            ifds = _read_ifds(prefix)
            break
        except (struct.error, ValueError) as e:
            if isinstance(e, ValueError) and "not a little-endian" in str(e):
                raise
            if len(prefix) >= max_probe:
                raise ValueError("IFD chain larger than max_probe") from e
            more = fetch_range(len(prefix), 3 * len(prefix))
            if not more:
                # fetch_range hit EOF without the IFD chain ever parsing:
                # a truncated/corrupt COG. Without this guard the probe
                # loop would spin forever on a 0-byte grow.
                raise ValueError("truncated COG: header probe hit EOF") from e
            prefix = prefix + more
    reduced = [t for t in ifds if t.get(T_NEW_SUBFILE, [0])[0] == 1]
    if len(reduced) < level:
        raise ValueError(f"COG has {len(reduced)} overview levels, wanted {level}")
    tags = dict(reduced[level - 1])
    off_tag = T_TILE_OFFSETS if T_TILE_OFFSETS in tags else T_STRIP_OFFSETS
    cnt_tag = T_TILE_COUNTS if T_TILE_OFFSETS in tags else T_STRIP_COUNTS
    offs, cnts = tags[off_tag], tags[cnt_tag]
    # fetch ONLY this page's segments, remapping their offsets into a
    # compact local buffer the ordinary decoder reads
    buf = bytearray(prefix)
    new_offs = []
    fetched = len(prefix)
    for o, c in zip(offs, cnts):
        if o + c <= len(prefix):  # tiny overview already inside the probe
            new_offs.append(o)
            continue
        new_offs.append(len(buf))
        buf += fetch_range(o, c)
        fetched += c
    tags[off_tag] = new_offs
    return _decode_ifd(bytes(buf), tags), fetched
