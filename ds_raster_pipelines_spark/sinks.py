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

# Storage-tier / content-type rules of the reference
# (azure_utils.py:75-98: COOL + application/octet-stream default;
# pipeline.py:285-292: HOT + image/tiff for processed COG outputs).
TIER_HOT = "HOT"
TIER_COOL = "COOL"
CT_TIFF = "image/tiff"
CT_OCTET = "application/octet-stream"


def with_storage_properties(df: DataFrame, processed: bool = False) -> DataFrame:
    """S9 tier semantics as DATA: attach ``blob_tier`` / ``content_type``
    columns derived from the reference's rules. A Spark/Iceberg table has
    no per-blob tier API, so the properties ride as columns — an Azure
    uploader maps them to ``standard_blob_tier``/``ContentSettings``
    per object, an Iceberg catalog to table properties; lifecycle policies
    (tier by age) become plain UPDATE/filter expressions over them."""
    tiffish = F.col("fmt").isin("tif", "cog")
    return df.withColumns(
        {
            "blob_tier": F.when(F.lit(processed) & tiffish, TIER_HOT).otherwise(TIER_COOL),
            "content_type": F.when(tiffish, CT_TIFF).otherwise(F.lit(CT_OCTET)),
        }
    )


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
    # processed COG output → HOT tier + image/tiff (pipeline.py:285-292)
    out = with_storage_properties(
        reencode_cog(images, tile=tile, overviews=overviews), processed=True
    )
    writer = out.write.mode("overwrite")
    if "pcell" in images.columns:
        writer = writer.partitionBy("pcell")
    writer.parquet(path)
    return True
