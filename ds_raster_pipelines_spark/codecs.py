"""Deterministic tile codecs (stdlib + numpy only) and the PSNR gate.

Three formats for the ``images.fmt`` column (BASELINE.json input_hint):

* ``raw`` — uint8 row-major pixels, lossless.
* ``png`` — real grayscale 8-bit PNG (zlib chunks, filter 0), lossless.
  A from-scratch minimal encoder/decoder so the container needs no
  imaging library; round-trips bit-exact.
* ``qnt`` — LOSSY 1-bit quantization (LSB cleared). Deterministic stand-in
  for JPEG: exercises the PSNR>=40dB gate of the input_hint (worst-case
  PSNR of LSB-clearing = 10*log10(255^2/0.5) ~ 51 dB).

Unsupported media (audio/video decode — libs absent in this container) are
stubbed behind NotImplementedError; the Spark-side plumbing around them is
real and tested (sources/multimodal.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

LOSSLESS_FMTS = frozenset({"raw", "png", "tif", "cog", "nc"})
LOSSY_FMTS = frozenset({"qnt"})
ALL_FMTS = LOSSLESS_FMTS | LOSSY_FMTS

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(
        ">I", zlib.crc32(tag + payload) & 0xFFFFFFFF
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Grayscale 8-bit PNG, filter type 0 per scanline."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bitdepth 8, gray
    scan = np.empty((h, w + 1), dtype=np.uint8)
    scan[:, 0] = 0
    scan[:, 1:] = px
    idat = zlib.compress(scan.tobytes(), 6)
    return _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w + 1)
    if np.any(raw[:, 0] != 0):
        raise ValueError("only filter 0 supported")
    return raw[:, 1:].copy()


def encode_raw(pixels: np.ndarray) -> bytes:
    return np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w).copy()


def encode_qnt(pixels: np.ndarray) -> bytes:
    """Lossy: clear the LSB, then store raw."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8) & 0xFE
    return px.tobytes()


def encode_tile(pixels: np.ndarray, fmt: str, meta: dict | None = None) -> bytes:
    """``meta`` is consumed by container formats that embed georeferencing
    (currently 'nc': lon0/lat_top/span_deg/date_days); pixel-only formats
    ignore it."""
    if fmt == "raw":
        return encode_raw(pixels)
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "qnt":
        return encode_qnt(pixels)
    if fmt == "tif":  # strip-based PackBits TIFF (tiff.py, from scratch)
        from . import tiff

        return tiff.encode_tif(pixels)
    if fmt == "cog":  # tiled TIFF + overview IFD — the COG sink shape
        from . import tiff

        return tiff.encode_cog(pixels)
    if fmt == "nc":  # classic NetCDF-3 container (netcdf.py, from scratch)
        from . import netcdf

        return netcdf.encode_nc_tile(pixels, **(meta or {}))
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_tile(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """bytes -> uint8 (h, w). The single entry point the Arrow kernels use."""
    if fmt in ("raw", "qnt"):
        return decode_raw(data, w, h)
    if fmt == "png":
        return decode_png(data)
    if fmt in ("tif", "cog"):  # both read the full-resolution IFD
        from . import tiff

        return tiff.decode_tif(data)
    if fmt == "nc":  # classic NetCDF-3: (time, lat, lon) band_data
        from . import netcdf

        return netcdf.decode_nc_tile(data)
    if fmt in ("jpg", "jpeg", "webp"):
        # Real lossy codecs need an imaging lib absent from this container;
        # the 'qnt' format stands in for the lossy path (PSNR gate).
        raise NotImplementedError(f"codec {fmt!r} not available in this environment")
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
