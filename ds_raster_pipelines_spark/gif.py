"""From-scratch GIF (GIF89a) codec — LZW-compressed palette images.

The reference publishes PNG browse images next to its COGs
(``/root/reference/src/utils/cloud_utils.py`` upload paths and
``pipeline.py:277`` raster products); GIF is the other classic lossless
raster container a browse/thumbnail pipeline meets, and its GIF-variant
LZW is a genuinely different compression family from everything else in
this repo (zlib's LZ77+Huffman in png/zip/hdf5, PackBits runs in tiff,
bit-plane packing in grib): a growing string table with variable-width
codes packed LSB-first, 9 -> 12 bits, Clear/EOI control codes.

Implements, per the public GIF89a specification:
* header + logical screen descriptor + 256-entry global color table
  (grayscale ramp: index i = RGB(i,i,i) — our tiles are single-band),
* image descriptor + table-based image data in <=255-byte sub-blocks,
* GIF-LZW encode/decode: initial code size 8 (257 root codes incl.
  Clear=256, EOI=257), table capped at 4096 with Clear-code reset,
  LSB-first variable-width bit packing, KwKwK first-code edge case,
* trailer; Graphic Control / application extensions are skipped on read.

uint8 single-band tiles round-trip bit-exactly (the palette is the
identity ramp). Interlace, local color tables, animation frames beyond
the first, and transparency are not implemented (raise / skipped).
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = b"GIF89a"


# ------------------------------------------------------------------ encode ---

def encode_gif(pixels: np.ndarray) -> bytes:
    """uint8 (h, w) single-band image -> GIF89a bytes (grayscale ramp
    palette, one image, no extensions)."""
    px = np.ascontiguousarray(pixels)
    if px.dtype != np.uint8 or px.ndim != 2:
        raise ValueError("encode_gif wants a 2-D uint8 array")
    h, w = px.shape
    out = bytearray(_HDR)
    # logical screen descriptor: global table, 8-bit color, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    ramp = np.repeat(np.arange(256, dtype=np.uint8), 3)  # identity palette
    out += ramp.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(8)  # LZW minimum code size
    comp = _lzw_encode(px.reshape(-1))
    for k in range(0, len(comp), 255):
        block = comp[k : k + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


class _BitWriter:
    """LSB-first bit packer (GIF's packing order)."""

    __slots__ = ("acc", "nbits", "out")

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


_CLEAR, _EOI = 256, 257


def _lzw_encode(data: np.ndarray) -> bytes:
    bw = _BitWriter()
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _EOI + 1
    bw.put(_CLEAR, width)
    prev = b""
    for b in data.tobytes():
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        bw.put(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # width grows when the NEXT code would not fit current width
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4095:
            bw.put(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = _EOI + 1
            width = 9
        prev = bytes([b])
    if prev:
        bw.put(table[prev], width)
    bw.put(_EOI, width)
    return bw.flush()


# ------------------------------------------------------------------ decode ---

def _lzw_decode(comp: bytes, n_out: int) -> np.ndarray:
    out = bytearray()
    bitpos = 0
    total_bits = len(comp) * 8
    width = 9
    # table entries as (prefix_code, byte); roots are (-1, i)
    prefix = [-1] * 4096
    last = [0] * 4096
    for i in range(256):
        last[i] = i
    next_code = _EOI + 1
    prev_code = -1

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return _EOI
        byte0 = bitpos >> 3
        v = int.from_bytes(comp[byte0 : byte0 + 3], "little")
        v = (v >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    def expand(code: int) -> bytes:
        chunk = bytearray()
        while code >= 0:
            chunk.append(last[code])
            code = prefix[code]
        chunk.reverse()
        return bytes(chunk)

    while len(out) < n_out:
        code = read_code()
        if code == _CLEAR:
            next_code = _EOI + 1
            width = 9
            prev_code = -1
            continue
        if code == _EOI:
            break
        if prev_code < 0:
            # first code after a Clear must be a root (or at least an
            # already-defined code — but the table was just reset, so only
            # roots exist): a stale 258..4095 code would expand leftover
            # table contents from before the Clear instead of raising
            if code >= next_code:
                raise ValueError(f"corrupt LZW stream: code {code} > {next_code}")
            out += expand(code)
            prev_code = code
            continue
        if code < next_code:
            s = expand(code)
        elif code == next_code:
            # KwKwK: the code being defined right now
            s = expand(prev_code)
            s += s[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > {next_code}")
        if next_code < 4096:
            prefix[next_code] = prev_code
            last[next_code] = s[0]  # first byte of the just-expanded string
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev_code = code
        out += s
    if len(out) < n_out:
        raise ValueError(f"LZW stream ended early: {len(out)} of {n_out} pixels")
    return np.frombuffer(bytes(out[:n_out]), np.uint8)


def decode_gif(data: bytes) -> np.ndarray:
    """First image of a GIF87a/89a file -> uint8 (h, w) via the palette's
    red channel (identity for our grayscale ramp)."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF file")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(data, np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _, _, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if ipacked & 0x80:  # local color table
                n = 2 << (ipacked & 0x07)
                palette = np.frombuffer(
                    data, np.uint8, count=n * 3, offset=pos
                ).reshape(n, 3)
                pos += n * 3
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            mcs = data[pos]
            pos += 1
            if mcs != 8:
                raise NotImplementedError(f"LZW min code size {mcs} (non-8-bit)")
            comp = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                comp += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(comp), w * h).reshape(h, w)
            if palette is None:
                raise ValueError("GIF image without a color table")
            return palette[idx, 0]  # red channel (identity ramp -> index)
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")
