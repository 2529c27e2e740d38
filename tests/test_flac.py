"""FLAC codec (flac.py): bitstream round-trips, decoder superset paths,
corruption detection. Pure numpy — no Spark session needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ds_raster_pipelines_spark import flac


def _roundtrip(x: np.ndarray) -> bytes:
    blob = flac.encode_flac(x)
    y = flac.decode_flac(blob)
    assert y.dtype == np.dtype("<i2")
    assert np.array_equal(np.asarray(x, np.int16), y)
    return blob


def test_roundtrip_families():
    rng = np.random.default_rng(7)
    _roundtrip(rng.integers(-32768, 32768, 5000).astype(np.int16))  # incompressible
    _roundtrip(np.full(1000, -123, np.int16))  # CONSTANT subframes
    _roundtrip((np.arange(3000) % 20000 - 10000).astype(np.int16))  # order-1 friendly
    _roundtrip((np.sin(np.arange(4000) * 0.05) * 20000).astype(np.int16))  # order-2+
    _roundtrip(np.array([5], np.int16))  # single-sample stream
    _roundtrip(np.array([], np.int16))  # empty stream
    _roundtrip(np.array([-32768, 32767, -32768, 32767, 0, 1, -1], np.int16))  # extremes


def test_compression_actually_happens():
    x = (np.sin(np.arange(8192) * 0.03) * 15000).astype(np.int16)
    blob = flac.encode_flac(x)
    assert len(blob) < 0.5 * 2 * len(x)  # smooth signal compresses well
    rnd = np.random.default_rng(0).integers(-32768, 32768, 8192).astype(np.int16)
    assert len(flac.encode_flac(rnd)) < 1.15 * 2 * len(rnd)  # bounded overhead


def test_corpus_formula_roundtrip():
    from ds_raster_pipelines_spark.sources.multimodal import flac_samples_for

    for i in (0, 1, 17, 31, 4000, 123456):
        _roundtrip(flac_samples_for(i))


def test_partition_order_gt0_decodes():
    """Encoder writes partition order 0; the decoder must handle any
    order — hand-build a FIXED order-1 subframe with porder=2."""
    bs = 64
    x = np.arange(bs, dtype=np.int64) * 3 + 5  # order-1 residual = 3 everywhere
    resid = np.diff(x)
    bw = flac._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(0b0111, 4)  # 16-bit blocksize-1 follows header
    bw.write(0b0000, 4)
    bw.write(0b0000, 4)
    bw.write(0b100, 3)
    bw.write(0, 1)
    bw.align()
    hdr = bytearray(bw.bytes()) + flac._utf8_encode(0) + struct.pack(">H", bs - 1)
    hdr.append(flac._crc8(bytes(hdr)))
    body = flac._BitWriter()
    body.write(0, 1)
    body.write(0b001001, 6)  # FIXED order 1
    body.write(0, 1)
    body.write(int(x[0]) & 0xFFFF, 16)  # warmup
    body.write(0b00, 2)  # rice, 4-bit params
    body.write(2, 4)  # partition order 2 -> 4 partitions
    u = flac._zigzag(resid)
    w = 0
    for part in range(4):
        cnt = bs // 4 - (1 if part == 0 else 0)
        body.write(3, 4)  # rice param 3
        for _ in range(cnt):
            v = int(u[w]); w += 1
            body.write_unary(v >> 3)
            body.write(v, 3)
    body.align()
    frame = bytes(hdr) + body.bytes()
    frame += struct.pack(">H", flac._crc16(frame))

    import hashlib
    pcm = x.astype("<i2").tobytes()
    si = struct.pack(">HH", bs, bs) + b"\x00" * 6
    si += ((8000 << 44) | (15 << 36) | bs).to_bytes(8, "big")
    si += hashlib.md5(pcm).digest()
    blob = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si + frame
    y = flac.decode_flac(blob)
    assert np.array_equal(y, x.astype(np.int16))


def test_escaped_partition_roundtrip():
    """Alternating extremes make Rice worse than raw — the encoder's
    escape branch and the decoder's raw branch must agree."""
    x = np.tile(np.array([-32768, 32767], np.int16), 500)
    blob = _roundtrip(x)
    assert len(blob) < 1.3 * 2 * len(x)


def test_crc_and_md5_detect_corruption():
    x = (np.arange(2000) % 7000 - 3500).astype(np.int16)
    blob = bytearray(flac.encode_flac(x))
    # flip a bit in the last frame's audio payload
    bad = blob.copy()
    bad[-20] ^= 0x10
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(bad))
    # truncated stream
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(blob[: len(blob) - 7]))
    # not a flac
    with pytest.raises(ValueError):
        flac.decode_flac(b"RIFF" + bytes(blob[4:]))


def test_utf8_frame_numbers():
    for n in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF, (1 << 30)):
        enc = flac._utf8_encode(n)
        br = flac._BitReader(enc)
        assert flac._utf8_decode(br) == n


def test_many_frames_exercises_frame_numbering():
    # > 128 frames forces multi-byte UTF-8 frame numbers on the wire
    x = (np.arange(256 * 130) % 9000 - 4500).astype(np.int16)
    _roundtrip(x)
