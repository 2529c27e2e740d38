"""Tile decode kernels — the distributed analog of the reference's raster
scan + normalize stage (S1/S3/S4 + F1-F5 in SURVEY.md §2).

All pixel math is inside ``mapInPandas`` over Arrow batches (input_hint: no
per-row Python in the relational plan; inside a batch the per-image loop is
over *blobs*, each decoded with vectorized numpy). Decode emits per-tile
statistics rather than raw pixels so the downstream relational plan stays
columnar and shuffle-light — pixels never cross a shuffle boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs, corpus

DECODE_STATS_SCHEMA = (
    "i bigint, image_id string, caption string, fmt string, phash bigint,"
    " mean_value double, min_value double, max_value double, n_px bigint"
)


def decode_stats(images: DataFrame) -> DataFrame:
    """images -> per-tile decoded stats. Columns preserved: i, image_id,
    caption (byte-exact propagation — input_hint invariant), fmt, phash."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            mean = np.empty(n)
            mn = np.empty(n)
            mx = np.empty(n)
            npx = np.empty(n, dtype=np.int64)
            blobs = pdf["bytes"].to_numpy()
            fmts = pdf["fmt"].to_numpy()
            ws = pdf["w"].to_numpy()
            hs = pdf["h"].to_numpy()
            for k in range(n):
                px = codecs.decode_tile(blobs[k], fmts[k], int(ws[k]), int(hs[k]))
                mean[k] = px.mean(dtype=np.float64)
                mn[k] = float(px.min())
                mx[k] = float(px.max())
                npx[k] = px.size
            yield pd.DataFrame(
                {
                    "i": pdf["i"].to_numpy(),
                    "image_id": pdf["image_id"].to_numpy(),
                    "caption": pdf["caption"].to_numpy(),
                    "fmt": fmts,
                    "phash": pdf["phash"].to_numpy(),
                    "mean_value": mean,
                    "min_value": mn,
                    "max_value": mx,
                    "n_px": npx,
                }
            )

    return images.mapInPandas(kernel, schema=DECODE_STATS_SCHEMA)


VERIFY_SCHEMA = "i bigint, fmt string, psnr double, caption_ok boolean, lossless_exact boolean"


def decode_verify(images: DataFrame) -> DataFrame:
    """Per-row invariant check vs the analytic ground truth (input_hint):
    decoded pixels allclose for lossless fmts, PSNR>=40dB for lossy, and
    byte-exact caption propagation. Distributed constraint operator in the
    style of the reference's validate_dataset gate
    (/root/reference/src/pipelines/pipeline.py:275-276)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"i": [], "fmt": [], "psnr": [], "caption_ok": [], "lossless_exact": []}
            for _, row in pdf.iterrows():
                i = int(row["i"])
                truth = corpus.pixels_for(i)
                px = codecs.decode_tile(row["bytes"], row["fmt"], int(row["w"]), int(row["h"]))
                out["i"].append(i)
                out["fmt"].append(row["fmt"])
                out["psnr"].append(codecs.psnr(truth, px))
                out["caption_ok"].append(row["caption"] == corpus.caption_for(i))
                out["lossless_exact"].append(
                    bool(np.array_equal(truth, px)) if row["fmt"] in codecs.LOSSLESS_FMTS else None
                )
            yield pd.DataFrame(out)

    return images.mapInPandas(kernel, schema=VERIFY_SCHEMA)
