"""MPEG-1 Layer II codec tests (mpeg_audio.py)."""
import numpy as np
import pytest

from ds_raster_pipelines_spark import mpeg_audio as mp2
from ds_raster_pipelines_spark.sources.multimodal import mp2_samples_for


def _psnr(dec: np.ndarray, ref: np.ndarray) -> float:
    err = dec[mp2.DELAY : mp2.DELAY + len(ref)].astype(np.float64) - ref
    return 10.0 * np.log10(32767.0**2 / max((err**2).mean(), 1e-12))


def _tone_clip(n: int = 1152 * 2) -> np.ndarray:
    k = np.arange(n)
    sig = 9000 * np.sin(2 * np.pi * 1900 * k / 48000) + 3500 * np.sin(
        2 * np.pi * 6400 * k / 48000
    )
    return np.round(sig).astype("<i2")


def test_filterbank_near_perfect_reconstruction():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(9216)
    y = mp2._synthesis(mp2._analysis(np.concatenate([x, np.zeros(1152)])))
    err = y[mp2.DELAY : mp2.DELAY + len(x)] - x
    db = 10 * np.log10((err**2).mean() / (x**2).mean())
    assert db < -55.0, db


def test_round_trip_psnr_and_lengths():
    pcm = _tone_clip()
    blob = mp2.encode_mp2(pcm)
    dec = mp2.decode_mp2(blob)
    assert len(dec) == len(pcm) + 1152  # one flush frame
    assert _psnr(dec, pcm.astype(np.float64)) >= 55.0


def test_corpus_clips_clear_psnr_gate():
    for i in (0, 1, 2, 7, 13, 101):
        ref = mp2_samples_for(i)
        dec = mp2.decode_mp2(mp2.encode_mp2(ref))
        assert len(dec) == len(ref) + 1152
        assert _psnr(dec, ref.astype(np.float64)) >= 40.0  # input-hint gate


def test_encode_deterministic():
    pcm = _tone_clip()
    assert mp2.encode_mp2(pcm) == mp2.encode_mp2(pcm)


def test_faint_subbands_use_grouped_quantizers():
    """The 40-amplitude tone at subband ~20 must land on a grouped
    (3/5/9-level) quantizer — both bitstream paths are exercised."""
    ref = mp2_samples_for(0)
    blob = mp2.encode_mp2(ref)
    from ds_raster_pipelines_spark.flac import _BitReader

    br = _BitReader(blob)
    [br.read(8) for _ in range(4)]
    br.read(16)
    allocs = []
    for sb in range(mp2.SBLIMIT):
        nbal, levels = mp2._sb_class(sb)
        code = br.read(nbal)
        allocs.append(0 if code == 0 else levels[code - 1])
    assert any(a in (3, 5, 9) for a in allocs), allocs
    assert any(a > 9 for a in allocs), allocs  # loud bands fine-quantized


def test_crc_detects_side_info_corruption():
    blob = bytearray(mp2.encode_mp2(_tone_clip()))
    blob[8] ^= 0x10  # inside the allocation bits
    with pytest.raises(ValueError, match="CRC"):
        mp2.decode_mp2(bytes(blob))


def test_lost_sync_and_truncation_raise():
    blob = mp2.encode_mp2(_tone_clip())
    with pytest.raises(ValueError, match="sync"):
        mp2.decode_mp2(b"\x00" + blob)
    with pytest.raises(ValueError):
        mp2.decode_mp2(blob[: len(blob) // 2])


def test_silence_encodes_tiny_and_decodes_zero():
    pcm = np.zeros(1152, dtype="<i2")
    blob = mp2.encode_mp2(pcm)
    assert len(blob) < 60  # header+crc+side only, no scalefactors/samples
    dec = mp2.decode_mp2(blob)
    assert len(dec) == 2304 and not dec.any()


def test_length_must_be_frame_multiple():
    with pytest.raises(ValueError, match="1152"):
        mp2.encode_mp2(np.zeros(1000, dtype="<i2"))


def test_scalefactor_closed_form():
    # Table B.1 closed form: sf[i] = 2 * 2^(-i/3); spot anchors
    assert mp2.SCALEFACTORS[0] == 2.0
    assert abs(mp2.SCALEFACTORS[3] - 1.0) < 1e-12
    assert abs(mp2.SCALEFACTORS[6] - 0.5) < 1e-12
    assert np.all(np.diff(mp2.SCALEFACTORS) < 0)
