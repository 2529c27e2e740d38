"""S11: genuine zip-archive sources — build + member-explode over REAL
container bytes.

The reference's FloodScan feed delivers rolling 90-day zip archives; the
pipeline lists members, parses each member's date from its filename, and
selectively extracts only wanted dates (floodscan_pipeline.py:184-218).
The distributed analog: archives are rows of a binary column, and one
Arrow-batched kernel per task parses the central directory, CRC-checks
and extracts members, and emits one relational row per member — after
which member selection is ordinary DataFrame semi-join logic, exactly
like every other filter in the engine.

Scale notes: one archive blob is one Arrow element, so per-task memory is
bounded by (batch rows) x (largest archive); zip64-sized blobs are
rejected by the codec — at 100 TB an oversized archive must be re-sharded
upstream, not smuggled through a 4 GiB+ Arrow cell.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import ziparchive


def build_monthly_archives(months: DataFrame, month_col: str = "m") -> DataFrame:
    """Deterministically synthesize one zip archive per month: a member
    per day named with the reference's compact-date grammar
    (``aer_sfed_area_300s_v{yyyyMMdd}_v05r01.tif``,
    floodscan_pipeline.py:50-52 / date_utils.py compact form), payload =
    the ISO date string repeated day-of-month times (content is a pure
    function of the member date, so a decompress/CRC bug shows up as a
    value divergence downstream).

    One archive per task row via applyInPandas — identical input months
    yield bit-identical archives (fixed header timestamps)."""

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for m in pdf[month_col]:
            first = pd.Timestamp(m).normalize().replace(day=1)
            days = pd.date_range(first, first + pd.offsets.MonthEnd(0), freq="D")
            members = [
                (
                    f"aer_sfed_area_300s_v{d.strftime('%Y%m%d')}_v05r01.tif",
                    (d.strftime("%Y-%m-%d") * d.day).encode(),
                )
                for d in days
            ]
            out_a.append(first.strftime("%Y-%m"))
            out_b.append(ziparchive.encode_zip(members))
        return pd.DataFrame({"archive": out_a, "zip_bytes": out_b})

    return months.select(month_col).distinct().groupBy(month_col).applyInPandas(
        encode, schema="archive string, zip_bytes binary"
    )


def explode_zip_members(
    archives: DataFrame,
    bytes_col: str = "zip_bytes",
    id_col: str = "archive",
    verify_payload_date: bool = False,
) -> DataFrame:
    """One row per zip member: (id_col, member_name, member_size),
    CRC-verified extraction through the from-scratch central-directory
    reader. With ``verify_payload_date`` the kernel additionally asserts
    each member's decompressed payload begins with the ISO form of the
    date embedded in its filename — corrupt content fails the task
    instead of silently flowing on."""

    def kernel(batches):
        import re

        for pdf in batches:
            ids, names, sizes = [], [], []
            for aid, blob in zip(pdf[id_col], pdf[bytes_col]):
                buf = bytes(blob)
                for m in ziparchive.list_members(buf):
                    payload = ziparchive.read_member(buf, m)  # CRC check
                    if verify_payload_date:
                        g = re.search(r"(\d{8})", m.name)
                        iso = f"{g[1][:4]}-{g[1][4:6]}-{g[1][6:]}"
                        if not payload.startswith(iso.encode()):
                            raise ValueError(
                                f"payload/filename date mismatch in {m.name!r}"
                            )
                    ids.append(aid)
                    names.append(m.name)
                    sizes.append(len(payload))
            yield pd.DataFrame(
                {id_col: ids, "member_name": names, "member_size": sizes}
            )

    return archives.mapInPandas(
        kernel, schema=f"{id_col} string, member_name string, member_size long"
    )


def materialized_monthly_archives(
    spark, sf_dir: str, cache_root: str = "/tmp/spark_graft_corpus"
) -> str:
    """Materialize the per-month zip corpus for ``sf_dir`` once and return
    its parquet path. Mirrors production (archives are STORED objects, not
    generated inline) and keeps archive-consuming queries at exactly ONE
    Python stage — the member-explode kernel (same rule as
    corpus.materialized_images: chaining generate→parse Arrow kernels
    ships the binary column across two JVM↔Python boundaries)."""
    import os

    from .. import corpus as corpus_mod

    key = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    path = f"{cache_root}/{corpus_mod.CORPUS_VERSION}/{key}_ziparch"
    if not os.path.exists(f"{path}/_SUCCESS"):
        months = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select(F.date_trunc("month", "o_orderdate").alias("m"))
            .distinct()
        )
        build_monthly_archives(months).write.mode("overwrite").parquet(path)
    return path
