"""Raster sinks: COG re-encode + validated write (S12/S13).

The reference validates each processed raster and then writes it as a
``driver="COG"`` GeoTIFF (``/root/reference/src/pipelines/pipeline.py:262-293``,
write at ``:277``). The distributed analog here:

* ``reencode_cog`` — one Arrow-batched kernel that decodes every tile
  (any supported fmt) and re-encodes it as a tiled TIFF with a reduced-
  resolution overview IFD (``tiff.encode_cog``) — bytes+fmt columns are
  replaced, everything else passes through untouched;
* ``write_cog_corpus`` — gates the write on a validation report
  (``operators.validate.validated_write_gate`` — the distributed form of
  raising before the COG write at pipeline.py:275-277), then writes the
  re-encoded corpus as a parquet table of COG bytes.

The rescan path needs nothing new: ``codecs.decode_tile`` already reads
fmt='cog' (full-res IFD), so every downstream kernel (zonal stats,
histograms, resample) runs unchanged over the sink's output.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import codecs, tiff


def reencode_cog(images: DataFrame, tile: int = 32, overviews: int = 1) -> DataFrame:
    """Decode each tile and re-encode as COG bytes (fmt='cog').

    Single mapInPandas stage; column set and order preserved. The decode→
    encode round-trip is lossless for lossless inputs and re-encodes the
    already-lossy pixels bit-exactly for lossy ones — downstream stats are
    identical to the pre-sink corpus either way (pytest-gated).
    """
    cols = images.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in images.schema.fields
    )

    def kernel(batches):
        for pdf in batches:
            blobs = []
            for data, fmt, w, h in zip(pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]):
                px = codecs.decode_tile(bytes(data), fmt, int(w), int(h))
                blobs.append(tiff.encode_cog(px, tile=tile, overviews=overviews))
            pdf = pdf.assign(
                bytes=pd.Series(blobs, index=pdf.index, dtype=object),
                fmt="cog",
            )
            yield pdf[cols]

    return images.mapInPandas(kernel, schema=schema)


def write_cog_corpus(
    images: DataFrame, report: DataFrame, path: str, tile: int = 32, overviews: int = 1
) -> bool:
    """Validate-then-write: returns False (and writes nothing) when the
    report carries violations; otherwise writes the COG-encoded corpus
    partitioned like the input (pcell column if present) and returns True."""
    from .operators.validate import validated_write_gate

    if not validated_write_gate(images, report):
        return False
    out = reencode_cog(images, tile=tile, overviews=overviews)
    writer = out.write.mode("overwrite")
    if "pcell" in images.columns:
        writer = writer.partitionBy("pcell")
    writer.parquet(path)
    return True
