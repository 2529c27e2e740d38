"""From-scratch GRIB2 container codec — stdlib struct + numpy.

GRIB is the reference's PRIMARY input: ERA5 monthly means and SEAS5
forecasts are opened with the cfgrib engine (era5_pipeline.py:59-66,
seas5_pipeline.py:108-123), including **header-level message selection**
via ``filter_by_keys={"dataType": "fcmean"}`` — messages are chosen by
their product-definition keys BEFORE any data unpacking. This module
implements the public WMO FM 92 GRIB edition-2 wire format directly
(same from-scratch pattern as tiff.py / netcdf.py / ziparchive.py):

* Section structure 0-8 with spec octet layouts: indicator (``GRIB`` +
  discipline + edition + 64-bit total length), identification,
  grid definition **template 3.0** (regular lat/lon grid, microdegree
  coordinates, scanning mode), product definition **template 4.1**
  (individual ensemble forecast: parameter category/number, generating
  process, forecast time, perturbation number, ensemble size),
  data representation **template 5.0** (simple packing: IEEE-754
  reference value R, binary scale E, decimal scale D, bits per value),
  bitmap indicator (255 = none), data, ``7777`` terminator.
* Multi-message files: GRIB messages are simply concatenated;
  ``scan_messages`` walks the file returning each message's keys and
  offsets WITHOUT touching section 7 — the filter-before-decode path.
* Simple packing decode/encode, vectorized bit-unpacking for any
  bits-per-value 1..32 (np.unpackbits over the packed stream):
  ``value = (R + X * 2**E) * 10**-D``.

Not implemented (raises): GRIB1 (edition byte 1), templates beyond
3.0/4.0/4.1/5.0, bitmaps (section 6 indicator != 255), jpeg/ccsds
packing. These cover the reference's lat/lon ensemble corpus shape; the
errors are explicit so unsupported real-world files fail loudly.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"GRIB"


class GribMessage:
    """Header keys of one message + offsets for lazy data decode."""

    __slots__ = (
        "offset", "length", "discipline", "param_category", "param_number",
        "template", "forecast_time", "perturbation", "n_ens", "ni", "nj",
        "lat1_mdeg", "lon1_mdeg", "di_mdeg", "dj_mdeg",
        "ref_value", "binary_scale", "decimal_scale", "bits_per_value",
        "n_points", "_data_offset", "_data_len",
    )

    def key(self) -> dict:
        """cfgrib-style filter keys (the filter_by_keys vocabulary)."""
        return {
            "discipline": self.discipline,
            "parameterCategory": self.param_category,
            "parameterNumber": self.param_number,
            "productDefinitionTemplateNumber": self.template,
            "forecastTime": self.forecast_time,
            "perturbationNumber": self.perturbation,
        }


def _sect(n: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), n) + body


def _pack_bits(x: np.ndarray, nbits: int) -> bytes:
    """Pack unsigned ints into a big-endian bit stream (MSB first)."""
    if nbits < 1 or nbits > 32:
        raise ValueError("bits_per_value in 1..32")
    n = len(x)
    bits = np.zeros((n, nbits), dtype=np.uint8)
    v = x.astype(np.uint64)
    for b in range(nbits):
        bits[:, nbits - 1 - b] = (v >> np.uint64(b)) & np.uint64(1)
    flat = bits.reshape(-1)
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(flat).tobytes()


def _unpack_bits(buf: bytes, n: int, nbits: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))[: n * nbits]
    bits = bits.reshape(n, nbits).astype(np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    for b in range(nbits):
        out = (out << np.uint64(1)) | bits[:, b]
    return out


def encode_message(
    values: np.ndarray,
    *,
    discipline: int = 0,
    param_category: int = 1,
    param_number: int = 52,
    template: int = 1,
    forecast_time: int = 0,
    perturbation: int = 0,
    n_ens: int = 1,
    lat1_deg: float = 90.0,
    lon1_deg: float = 0.0,
    d_deg: float = 0.25,
    decimal_scale: int = 0,
    binary_scale: int = 0,
    ref_date: tuple[int, int, int] = (2024, 1, 1),
) -> bytes:
    """One GRIB2 message for a (nj, ni) lat/lon grid, simple packing.

    ``template`` 1 = individual ensemble forecast (4.1, carries
    perturbation number); 0 = deterministic analysis/forecast (4.0).
    Simple packing is LOSSY in general: values quantize to the grid
    R + X * 2**binary_scale (then / 10**decimal_scale), R = min. Choose
    the scales so your data lands on that grid for a bit-exact
    round-trip (integers at D=E=0, quarter-steps at E=-2, ...)."""
    grid = np.ascontiguousarray(values, dtype=np.float64)
    if grid.ndim != 2:
        raise ValueError("values must be 2-D (nj, ni)")
    nj, ni = grid.shape
    npts = ni * nj

    dec = 10.0 ** decimal_scale
    binf = 2.0 ** binary_scale
    scaled = grid * dec
    r = float(scaled.min())
    x = np.round((scaled - r) / binf).astype(np.uint64)
    span = int(x.max()) if npts else 0
    nbits = max(1, span.bit_length())

    s1 = struct.pack(
        ">HHBBBHBBBBBBB", 74, 0, 2, 1, 1,
        ref_date[0], ref_date[1], ref_date[2], 0, 0, 0, 0, 1,
    )
    # grid definition template 3.0 (regular lat/lon, microdegrees)
    lat1 = int(round(lat1_deg * 1e6))
    lon1 = int(round(lon1_deg * 1e6)) % 360_000_000
    d_m = int(round(d_deg * 1e6))
    lat2 = lat1 - (nj - 1) * d_m
    lon2 = (lon1 + (ni - 1) * d_m) % 360_000_000
    s3 = (
        struct.pack(">BIBBH", 0, npts, 0, 0, 0)  # source, npts, 0, 0, template 3.0
        + struct.pack(">BBIBIBI", 6, 0, 0, 0, 0, 0, 0)  # earth shape octets
        + struct.pack(">II", ni, nj)
        + struct.pack(">IB", 0, 0)  # basic angle, subdivisions marker
        + struct.pack(">iI", lat1, lon1)
        + struct.pack(">B", 0x30)  # resolution/component flags
        + struct.pack(">iI", lat2, lon2)
        + struct.pack(">II", d_m, d_m)
        + struct.pack(">B", 0x00)  # scanning mode: +i, -j (north to south)
    )
    # product definition template 4.0 / 4.1
    pdt = struct.pack(
        ">BBBBBHBBI", param_category, param_number, 2, 0, 0, 0, 1, 0, forecast_time
    ) + struct.pack(">BBB", 1, 0, 0)  # fixed surface type/scale/value
    if template == 1:
        pdt += struct.pack(">BBB", 1, perturbation, n_ens)
    elif template != 0:
        raise NotImplementedError(f"product template 4.{template} not supported")
    s4 = struct.pack(">HH", 0, template) + pdt
    s5 = struct.pack(
        ">IHfhhBB", npts, 0, np.float32(r), binary_scale, decimal_scale, nbits, 0
    )
    s6 = struct.pack(">B", 255)  # no bitmap
    s7 = _pack_bits(x.reshape(-1), nbits)

    body = (
        _sect(1, s1) + _sect(3, s3) + _sect(4, s4) + _sect(5, s5)
        + _sect(6, s6) + _sect(7, s7) + b"7777"
    )
    total = 16 + len(body)
    s0 = _MAGIC + struct.pack(">HBBQ", 0, discipline, 2, total)
    return s0 + body


def encode_file(messages: list[bytes]) -> bytes:
    """A GRIB FILE is plain message concatenation (how ERA5/SEAS5 ship
    ensembles and forecast months in one download)."""
    return b"".join(messages)


def scan_messages(buf: bytes) -> list[GribMessage]:
    """Walk a multi-message file, parsing ONLY headers (sections 0-6
    metadata + the data section's offsets). Data stays packed — this is
    what makes filter_by_keys free: selection happens on these keys and
    only surviving messages ever run the bit-unpack."""
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        if buf[pos : pos + 4] != _MAGIC:
            raise ValueError(f"no GRIB indicator at offset {pos}")
        edition = buf[pos + 7]
        if edition != 2:
            raise NotImplementedError(f"GRIB edition {edition} not supported")
        m = GribMessage()
        m.offset = pos
        m.discipline = buf[pos + 6]
        (m.length,) = struct.unpack_from(">Q", buf, pos + 8)
        p = pos + 16
        end = pos + m.length
        while p < end - 4:
            slen, snum = struct.unpack_from(">IB", buf, p)
            body = p + 5
            if snum == 3:
                (tmpl,) = struct.unpack_from(">H", buf, body + 7)
                if tmpl != 0:
                    raise NotImplementedError(f"grid template 3.{tmpl} not supported")
                g = body + 9 + 16  # skip earth-shape octets
                m.ni, m.nj = struct.unpack_from(">II", buf, g)
                g += 8 + 5
                m.lat1_mdeg, m.lon1_mdeg = struct.unpack_from(">iI", buf, g)
                g += 8 + 1 + 8
                m.di_mdeg, m.dj_mdeg = struct.unpack_from(">II", buf, g)
            elif snum == 4:
                (m.template,) = struct.unpack_from(">H", buf, body + 2)
                if m.template not in (0, 1):
                    raise NotImplementedError(
                        f"product template 4.{m.template} not supported"
                    )
                t = body + 4
                m.param_category, m.param_number = struct.unpack_from(">BB", buf, t)
                (m.forecast_time,) = struct.unpack_from(">I", buf, t + 9)
                if m.template == 1:
                    m.perturbation, m.n_ens = struct.unpack_from(">BB", buf, t + 17)
                else:
                    m.perturbation, m.n_ens = 0, 1
            elif snum == 5:
                m.n_points, tmpl = struct.unpack_from(">IH", buf, body)
                if tmpl != 0:
                    raise NotImplementedError(f"packing template 5.{tmpl} not supported")
                (rv,) = struct.unpack_from(">f", buf, body + 6)
                m.ref_value = float(rv)
                m.binary_scale, m.decimal_scale = struct.unpack_from(">hh", buf, body + 10)
                m.bits_per_value = buf[body + 14]
            elif snum == 6:
                if buf[body] != 255:
                    raise NotImplementedError("bitmapped GRIB data not supported")
            elif snum == 7:
                m._data_offset = body
                m._data_len = slen - 5
            p += slen
        if buf[end - 4 : end] != b"7777":
            raise ValueError("GRIB message missing 7777 terminator")
        out.append(m)
        pos = end
    return out


def decode_values(buf: bytes, m: GribMessage) -> np.ndarray:
    """Unpack one scanned message's grid: (nj, ni) float64."""
    x = _unpack_bits(
        buf[m._data_offset : m._data_offset + m._data_len], m.n_points, m.bits_per_value
    )
    v = (m.ref_value + x.astype(np.float64) * 2.0 ** m.binary_scale) * (
        10.0 ** -m.decimal_scale
    )
    return v.reshape(m.nj, m.ni)

