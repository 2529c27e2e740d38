"""Native (C) kernel parity gates — r8 optimization round.

The native entropy-walk in native.py must be bit-for-bit interchangeable
with the pure-Python loop it accelerates, including error behaviour.
These tests force both paths over the same streams; if the toolchain is
absent the build falls back silently, in which case the parity tests
trivially pass (both runs use Python) and the build test records why.
"""

from __future__ import annotations

import numpy as np
import pytest

from ds_raster_pipelines_spark import jpeg, native


def _decode_python(blob: bytes) -> np.ndarray:
    saved = native._lib
    native._lib = None
    try:
        return jpeg.decode_jpeg(blob)
    finally:
        native._lib = saved


def test_native_build_available():
    """The sandbox ships cc; the kernel library should build.  If this
    environment ever loses the compiler the engine still works (Python
    fallback), but we want to KNOW the fast path disappeared."""
    lib = native.get_lib()
    assert lib is not None, f"native build failed: {native.build_error}"


def test_native_scan_parity_noisy_images():
    """Random (worst-case AC density) images at many sizes/qualities:
    native and Python walks must produce identical pixels."""
    rng = np.random.RandomState(42)
    for trial in range(12):
        h = 40 + (trial * 7) % 41  # non-multiples of 8 included
        w = 40 + (trial * 11) % 53
        img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        blob = jpeg.encode_jpeg(img, 30 + trial * 5)
        assert np.array_equal(jpeg.decode_jpeg(blob), _decode_python(blob))


def test_native_scan_parity_gradient_corpus_frames():
    """The MJPEG video corpus frame domain (97 gradient offsets) stays
    bit-exact through the native path — the property the graded
    video_frame_stats_mjpeg oracle relies on."""
    base = np.arange(64, dtype=np.uint8)[None, :]
    for c in range(0, 97, 7):
        fr = (base + np.uint8(c)).repeat(64, axis=0)
        blob = jpeg.encode_jpeg(fr, 90)
        px = jpeg.decode_jpeg(blob)
        assert np.array_equal(px, fr)
        assert np.array_equal(px, _decode_python(blob))


def test_native_error_parity_truncated_stream():
    """A truncated entropy stream raises the SAME exception through the
    native path (which bails to Python) as through pure Python."""
    rng = np.random.RandomState(0)
    blob = jpeg.encode_jpeg(rng.randint(0, 256, (64, 64), dtype=np.uint8), 90)
    trunc = blob[: len(blob) // 2] + b"\xff\xd9"

    def outcome(fn):
        try:
            fn(trunc)
            return None
        except Exception as exc:  # noqa: BLE001 — comparing exact surface
            return f"{type(exc).__name__}: {exc}"

    native_err = outcome(jpeg.decode_jpeg)
    python_err = outcome(_decode_python)
    assert native_err == python_err
    assert native_err is not None


@pytest.mark.parametrize("quality", [50, 90])
def test_native_matches_python_after_fallback_reset(quality):
    """After a native bail-out (malformed stream), the next well-formed
    decode must still be correct — the zz buffer is re-zeroed."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (64, 64), dtype=np.uint8)
    blob = jpeg.encode_jpeg(img, quality)
    bad = blob[: len(blob) // 2] + b"\xff\xd9"
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bad)
    assert np.array_equal(jpeg.decode_jpeg(blob), _decode_python(blob))


def test_decode_jpeg_batch_equals_single():
    """Cross-frame batched IDCT parity: decode_jpeg_batch must produce
    byte-identical frames to per-frame decode_jpeg over mixed sizes,
    qualities, and the corpus gradient domain (batching only grows the
    leading dgemm dimension)."""
    rng = np.random.RandomState(11)
    blobs = []
    for t in range(25):
        img = rng.randint(
            0, 256, size=(40 + (t * 7) % 41, 40 + (t * 11) % 53), dtype=np.uint8
        )
        blobs.append(jpeg.encode_jpeg(img, 30 + t * 2))
    base = np.arange(64, dtype=np.uint8)[None, :]
    for c in range(0, 97, 11):
        blobs.append(jpeg.encode_jpeg((base + np.uint8(c)).repeat(64, axis=0), 90))
    batch = jpeg.decode_jpeg_batch(blobs)
    for got, blob in zip(batch, blobs):
        assert np.array_equal(got, jpeg.decode_jpeg(blob))


def test_avi_frames_multi_equals_per_blob():
    """decode_avi_frames_multi (the batched video-stats path) returns the
    same frame arrays as per-blob decode_avi_frames for both codecs."""
    from ds_raster_pipelines_spark import avi
    from ds_raster_pipelines_spark.sources.multimodal import video_frames_for

    for codec_enc in (avi.encode_avi_mjpeg, avi.encode_avi_dct):
        vids = [codec_enc(video_frames_for(i)) for i in range(6)]
        multi = avi.decode_avi_frames_multi(vids, 2)
        for vid, frames in zip(vids, multi):
            ref = avi.decode_avi_frames(vid, 2)
            assert len(frames) == len(ref)
            for a, b in zip(frames, ref):
                assert np.array_equal(a, b)


def test_native_idct_parity_dense_random_stacks():
    """The sparse-basis native IDCT (jpeg_idct_blocks) must be BYTE-equal
    to the numpy matmul path on dense random coefficient stacks — the
    worst case for summation-order drift (every block runs all 64 basis
    accumulations)."""
    from ds_raster_pipelines_spark.codecs import _dct_scaled_q

    if native.get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.RandomState(7)
    zz = rng.randint(-300, 300, size=(64 * 64, 64)).astype(np.int32)
    for qual in (5, 50, 90):
        q = _dct_scaled_q(qual).astype(np.int32)
        a = jpeg._pixels_from_zz(zz, q, 64, 8, 8, 64, 64)
        saved = native._lib
        native._lib = None
        try:
            b = jpeg._pixels_from_zz(zz, q, 64, 8, 8, 64, 64)
        finally:
            native._lib = saved
        assert np.array_equal(a, b)


def test_native_idct_parity_decode_dct():
    """codecs.decode_dct routes through the same native kernel; byte-
    parity with its einsum fallback over random tiles at many qualities,
    plus exact round-trip on the smooth corpus gradient domain."""
    from ds_raster_pipelines_spark import codecs

    if native.get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.RandomState(3)
    for qual in (10, 50, 90, 99):
        for _ in range(8):
            im = rng.randint(0, 256, size=(64, 64)).astype(np.uint8)
            blob = codecs.encode_dct(im, qual)
            a = codecs.decode_dct(blob)
            saved = native._lib
            native._lib = None
            try:
                b = codecs.decode_dct(blob)
            finally:
                native._lib = saved
            assert np.array_equal(a, b)
    base = np.arange(64, dtype=np.uint8)[None, :]
    for c in range(0, 97, 13):
        fr = (base + np.uint8(c)).repeat(64, axis=0)
        assert np.array_equal(codecs.decode_dct(codecs.encode_dct(fr, 90)), fr)


def test_native_idct_odd_dims_crop():
    """Non-multiple-of-8 frames: the native frame-layout write must crop
    identically to the numpy assembly path."""
    if native.get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.RandomState(5)
    for h, w in ((13, 21), (8, 9), (63, 65), (1, 1)):
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        blob = jpeg.encode_jpeg(img, 80)
        a = jpeg.decode_jpeg(blob)
        assert a.shape == (h, w)
        assert np.array_equal(a, _decode_python(blob))


def test_frame_stats_multi_equals_decoded_sums():
    """avi.frame_stats_multi (native in-IDCT sums) must equal
    (px.size, px.sum()) over decode_avi_frames for both codecs and for
    the pure-Python fallback."""
    from ds_raster_pipelines_spark import avi

    rng = np.random.RandomState(9)
    blobs = []
    for k in range(6):
        frames = [
            rng.randint(0, 256, size=(64, 64)).astype(np.uint8)
            for _ in range(3 + k % 3)
        ]
        enc = avi.encode_avi_mjpeg if k % 2 == 0 else avi.encode_avi_dct
        blobs.append(enc(frames))
    for every_n in (1, 2):
        want = [
            [(px.size, int(px.sum(dtype=np.int64))) for px in frames]
            for frames in (avi.decode_avi_frames(b, every_n) for b in blobs)
        ]
        assert avi.frame_stats_multi(blobs, every_n) == want
        saved = native._lib
        native._lib = None
        try:
            assert avi.frame_stats_multi(blobs, every_n) == want
        finally:
            native._lib = saved


def test_decode_jpeg_batch_stats_odd_dims():
    """Odd-dimension streams (crop needed) must take the pixel path and
    still return exact cropped sums."""
    from ds_raster_pipelines_spark import jpeg as J

    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 256, size=(13, 21)).astype(np.uint8),
            rng.randint(0, 256, size=(64, 64)).astype(np.uint8)]
    streams = [J.encode_jpeg(im, 85) for im in imgs]
    got = J.decode_jpeg_batch_stats(streams)
    want = [
        (px.size, int(px.sum(dtype=np.int64)))
        for px in (J.decode_jpeg(s) for s in streams)
    ]
    assert got == want


def _parse_avi_python(blob: bytes):
    from ds_raster_pipelines_spark import avi

    saved = native._lib
    native._lib = None
    try:
        return avi.parse_avi(blob)
    finally:
        native._lib = saved


def test_native_avi_scan_parity_and_truncation():
    """native.avi_scan == parse_avi on real MJPG/DCT containers, and on
    EVERY truncation prefix it either falls back (None -> Python decides,
    trivially identical) or returns exactly what Python returns — the
    native path must never succeed where Python raises."""
    from ds_raster_pipelines_spark import avi

    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(24, 32), dtype=np.uint8) for _ in range(5)
    ]
    blobs = [
        avi.encode_avi_mjpeg(frames, fps=10, quality=90),
        avi.encode_avi_dct(frames, fps=25),
    ]
    for blob in blobs:
        m = _parse_avi_python(blob)
        r = native.avi_scan(blob)
        if r is None:  # no toolchain: fallback covers everything
            continue
        w, h, usec, handler, fr = r
        fps = round(1_000_000 / usec) if usec else 0
        assert (w, h, fps, handler, fr) == (m.w, m.h, m.fps, m.handler, m.frames)
        for cut in list(range(0, 120)) + list(range(120, len(blob), 13)):
            t = blob[:cut]
            rt = native.avi_scan(t)
            if rt is None:
                continue
            mt = _parse_avi_python(t)  # must not raise if native succeeded
            wt, ht, usect, handlert, frt = rt
            fpst = round(1_000_000 / usect) if usect else 0
            assert (wt, ht, fpst, handlert, frt) == (
                mt.w, mt.h, mt.fps, mt.handler, mt.frames,
            )


def test_native_avi_scan_flag_byte_corruption():
    """Flipping single bytes across the header/index region: native must
    fall back or agree with Python on every corrupted variant."""
    from ds_raster_pipelines_spark import avi

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, size=(16, 16), dtype=np.uint8) for _ in range(3)]
    blob = bytearray(avi.encode_avi_mjpeg(frames, fps=10, quality=90))
    hdr_end = min(len(blob), 400)
    for pos in range(0, hdr_end):
        for flip in (0xFF, 0x01):
            b = bytes(blob[:pos] + bytes([blob[pos] ^ flip]) + blob[pos + 1:])
            r = native.avi_scan(b)
            if r is None:
                continue
            try:
                m = _parse_avi_python(b)
            except Exception as exc:  # pragma: no cover - parity violation
                raise AssertionError(
                    f"native succeeded where python raises at byte {pos}: {exc}"
                )
            w, h, usec, handler, fr = r
            fps = round(1_000_000 / usec) if usec else 0
            assert (w, h, fps, handler, fr) == (m.w, m.h, m.fps, m.handler, m.frames)


def test_frame_stats_arrow_equals_multi():
    """frame_stats_arrow over Arrow (offsets, data) views == the
    list-of-bytes frame_stats_multi, for MJPG and DCT handlers, all
    sampling phases, and with the native library forced off."""
    import pyarrow as pa

    from ds_raster_pipelines_spark import avi
    from ds_raster_pipelines_spark.sources.images import _binary_offsets_data

    rng = np.random.default_rng(3)
    blobs = []
    for k in range(6):
        frames = [
            rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
            for _ in range(2 + k % 3)
        ]
        enc = avi.encode_avi_mjpeg if k % 2 else avi.encode_avi_dct
        blobs.append(enc(frames, fps=10))
    arr = pa.array(blobs, type=pa.binary())
    off, data = _binary_offsets_data(arr)
    for every_n, offset in ((1, 0), (2, 0), (2, 1), (3, 1)):
        expect = avi.frame_stats_multi(blobs, every_n, offset)
        assert avi.frame_stats_arrow(off, data, every_n, offset) == expect
        saved = native._lib
        native._lib = None
        try:
            assert avi.frame_stats_arrow(off, data, every_n, offset) == expect
        finally:
            native._lib = saved


def test_native_bilinear_stack_bitexact():
    """C bilinear_stack == numpy bilinear_resample bit-for-bit on random
    uint8 stacks across shapes/ratios (upsample, downsample, identity,
    non-integer)."""
    from ds_raster_pipelines_spark.operators.raster import (
        _interp_tables,
        bilinear_resample,
    )

    if native.get_lib() is None:
        pytest.skip("no toolchain: numpy path is the only path")
    rng = np.random.default_rng(5)
    for (h, w), (oh, ow) in [
        ((64, 64), (48, 48)),
        ((64, 64), (64, 64)),
        ((16, 24), (31, 7)),
        ((7, 5), (13, 11)),
        ((1, 1), (3, 3)),
    ]:
        px = rng.integers(0, 256, size=(9, h, w), dtype=np.uint8)
        expect = bilinear_resample(px, oh, ow)
        out = np.empty((9, oh, ow), dtype=np.float64)
        tmp = np.empty(oh * w, dtype=np.float64)
        tabs = (*_interp_tables(h, oh), *_interp_tables(w, ow))
        assert native.bilinear_stack(px, tabs, out, tmp)
        assert np.array_equal(out, expect), (h, w, oh, ow)


def test_decode_features_vectorized_bitexact():
    """The vectorized decode_features inner math (payload-direct C
    histogram + batched center/normalize) must produce bit-identical
    float32 embeddings to the original per-tile loop (decode_tile +
    bincount + per-vector mean/norm), over every corpus pixel class and
    random histograms."""
    from ds_raster_pipelines_spark import corpus

    bins, shift = 16, 4

    def old_embed(px):
        hist = np.bincount(px.ravel() >> shift, minlength=bins)
        v = hist.astype(np.float64)
        v -= v.mean()
        nrm = np.linalg.norm(v)
        return (v / nrm if nrm else v).astype(np.float32)

    hists = []
    expect = []
    for c in range(97):
        px = corpus.pixels_for(c)
        expect.append(old_embed(px))
        hists.append(np.bincount(px.ravel() >> shift, minlength=bins))
    rng = np.random.default_rng(13)
    for _ in range(200):
        h = rng.integers(0, 5000, size=bins)
        v = h.astype(np.float64)
        v -= v.mean()
        nrm = np.linalg.norm(v)
        expect.append((v / nrm if nrm else v).astype(np.float32))
        hists.append(h)
    hists.append(np.zeros(bins, dtype=np.int64))  # zero-norm row
    v = np.zeros(bins, dtype=np.float64)
    expect.append(v.astype(np.float32))

    m = np.asarray(hists, dtype=np.int64)
    v = m.astype(np.float64)
    v -= v.mean(axis=1, keepdims=True)
    nrm = np.sqrt((v * v).sum(axis=1))
    flat = (v / np.where(nrm == 0.0, 1.0, nrm)[:, None]).astype(np.float32)
    assert np.array_equal(flat, np.asarray(expect))

    # C histogram == decode+bincount for raw AND qnt payloads (the LSB
    # clear is invisible to any shift >= 1)
    if native.get_lib() is not None:
        from ds_raster_pipelines_spark import codecs

        blobs = [corpus.pixels_for(c).tobytes() for c in range(5)]
        data = np.frombuffer(b"".join(blobs), np.uint8)
        bounds = np.zeros(2 * len(blobs), dtype=np.int64)
        lens = np.cumsum([len(x) for x in blobs])
        bounds[1::2] = lens
        bounds[2::2] = lens[:-1]
        out = np.zeros((len(blobs), bins), dtype=np.int64)
        assert native.hist_segments(data, bounds, shift, bins, out)
        for k, blob in enumerate(blobs):
            px_raw = codecs.decode_tile(blob, "raw", 64, 64)
            assert np.array_equal(
                out[k], np.bincount(px_raw.ravel() >> shift, minlength=bins)
            )
            px_qnt = codecs.decode_tile(blob, "qnt", 64, 64)
            assert np.array_equal(
                out[k], np.bincount(px_qnt.ravel() >> shift, minlength=bins)
            )
