"""From-scratch GIF89a / LZW codec tests — gif.py.

GIF-variant LZW is a distinct compression family from everything else in
the repo (string table + variable-width LSB-first codes vs zlib's
LZ77+Huffman and TIFF's PackBits); evidence is byte-level structure
conformance against the public GIF89a spec plus property round-trips
covering the table-reset (Clear code) and KwKwK edge paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ds_raster_pipelines_spark import gif


def test_structure_conforms_to_gif89a():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    b = gif.encode_gif(px)
    assert b[:6] == b"GIF89a"
    w, h, packed, bg, ar = struct.unpack_from("<HHBBB", b, 6)
    assert (w, h) == (8, 8)
    assert packed & 0x80  # global color table present
    assert 2 << (packed & 7) == 256  # 256 entries
    pal = np.frombuffer(b, np.uint8, count=768, offset=13).reshape(256, 3)
    assert (pal[:, 0] == np.arange(256)).all()  # identity grayscale ramp
    assert (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()
    assert b[13 + 768] == 0x2C  # image descriptor follows immediately
    assert b[13 + 768 + 10] == 8  # LZW min code size
    assert b[-1] == 0x3B  # trailer


def test_roundtrip_core_shapes():
    rng = np.random.default_rng(1)
    grad = np.arange(64, dtype=np.uint8)[None, :] + np.zeros((64, 1), np.uint8)
    cases = [
        grad,  # the corpus tile shape: long repeats, deep table
        rng.integers(0, 256, size=(64, 64)).astype(np.uint8),
        np.full((33, 57), 7, np.uint8),  # constant: maximal run merging
        rng.integers(0, 256, size=(257, 129)).astype(np.uint8),  # forces Clear resets
    ]
    for t in cases:
        assert np.array_equal(gif.decode_gif(gif.encode_gif(t)), t)
    # LZW actually compresses the structured tile
    assert len(gif.encode_gif(grad)) < grad.size // 2 + 800


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 10_000), h=st.integers(1, 40), w=st.integers(1, 40),
       span=st.integers(1, 256))
def test_roundtrip_property(seed, h, w, span):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, span, size=(h, w)).astype(np.uint8)
    assert np.array_equal(gif.decode_gif(gif.encode_gif(px)), px)


def test_extensions_skipped_and_garbage_rejected():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    b = bytearray(gif.encode_gif(px))
    # splice a Graphic Control Extension before the image descriptor
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    k = b.index(0x2C, 13 + 768)
    spliced = bytes(b[:k]) + gce + bytes(b[k:])
    assert np.array_equal(gif.decode_gif(spliced), px)
    with pytest.raises(ValueError, match="not a GIF"):
        gif.decode_gif(b"PNG is not a gif" * 3)


def test_corpus_fmt_gif_decodes_to_ground_truth():
    from ds_raster_pipelines_spark import codecs
    from ds_raster_pipelines_spark.corpus import pixels_for

    for i in (0, 7, 16, 12345):
        px = pixels_for(i)
        blob = codecs.encode_tile(px, "gif")
        assert np.array_equal(codecs.decode_tile(blob, "gif", 64, 64), px)


def test_lzw_first_code_after_clear_must_be_root():
    """A corrupt stream whose first code after Clear is a stale table
    entry (>= next_code) must raise, not expand leftover table state."""
    import struct

    import numpy as np
    import pytest

    from ds_raster_pipelines_spark import gif

    px = ((np.arange(64)[None, :] + 3)).astype(np.uint8).repeat(64, axis=0)
    blob = bytearray(gif.encode_gif(px))
    # fixed layout: header(6) + LSD(7) + GCT(768) + descriptor(10) +
    # min-code-size(1) + sub-block length(1) -> first LZW byte at 793
    data_start = 793
    first = ((blob[data_start + 1] & 1) << 8) | blob[data_start]
    assert first == 256  # encoder leads with Clear
    # forge the code AFTER the Clear (bits 9..17) to stale entry 300:
    # the first-code-after-Clear branch must reject it, not expand it
    forged = 300
    blob[data_start + 1] = (blob[data_start + 1] & 0x01) | ((forged & 0x7F) << 1)
    blob[data_start + 2] = (blob[data_start + 2] & ~0x03) | (forged >> 7)
    with pytest.raises(ValueError, match="corrupt LZW"):
        gif.decode_gif(bytes(blob))
