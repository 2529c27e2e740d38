#!/usr/bin/env python
"""spark-submit entry point — dispatcher in the style of the reference's
``run_pipeline.py`` (/root/reference/run_pipeline.py:32-53), Spark-first.

    spark-submit --py-files ds_raster_pipelines_spark.zip run_pipeline.py <cmd> [...]
    # or locally:
    python run_pipeline.py <cmd> [...]

Commands:
    flagship     run the flagship zonal query (decode → H3 → PIP → agg)
    zonal-pixel  pixel-granularity zonal statistics
    ingest       date-partitioned ingest with checkpoint/resume
                 (--mode full|update|backfill, --out DIR)
    coverage     coverage report (expected vs present dates)
    verify       per-row invariant verification (PSNR + caption) sample
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="run_pipeline")
    ap.add_argument(
        "command",
        choices=["flagship", "zonal-pixel", "ingest", "coverage", "verify", "cog-sink"],
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--mode", default="full", choices=["full", "update", "backfill"])
    ap.add_argument("--out", default="/tmp/ds_raster_out")
    ap.add_argument("--start", default="2020-01-01")
    ap.add_argument("--end", default="2020-01-07")
    ap.add_argument("--log-level", default="WARN")
    args = ap.parse_args(argv)

    from ds_raster_pipelines_spark.session import get_spark

    spark = get_spark(f"run_pipeline_{args.command}", cpus=args.cpus)
    spark.sparkContext.setLogLevel(args.log_level)

    if args.command == "flagship":
        from ds_raster_pipelines_spark.plans.flagship import flagship_from_orders

        flagship_from_orders(spark, args.sf_dir).orderBy("adm_id").show(40, truncate=False)
    elif args.command == "zonal-pixel":
        from ds_raster_pipelines_spark import corpus
        from ds_raster_pipelines_spark.operators.raster import zonal_pixel_stats

        images = corpus.footprint_cols_for_images(
            spark.read.parquet(corpus.materialized_images(spark, args.sf_dir))
        )
        zonal_pixel_stats(images, corpus.admin_df(spark), res=6).orderBy("adm_id").show(
            40, truncate=False
        )
    elif args.command == "ingest":
        from ds_raster_pipelines_spark.plans.pipelines import IngestPipeline

        pipe = IngestPipeline(
            spark,
            args.out,
            dt.date.fromisoformat(args.start),
            dt.date.fromisoformat(args.end),
        )
        metrics = pipe.run_pipeline(args.mode)
        print(json.dumps({k: v for k, v in metrics.items() if k != "per_partition"}))
    elif args.command == "coverage":
        from pyspark.sql import functions as F

        from ds_raster_pipelines_spark.functions.scalars import date_range_df
        from ds_raster_pipelines_spark.operators.coverage import coverage_pct

        expected = date_range_df(spark, args.start, args.end, "D")
        try:
            existing = spark.read.parquet(f"{args.out}/data").select(
                F.col("date").alias("date")
            )
        except Exception:  # noqa: BLE001 — no output yet
            existing = spark.createDataFrame([], "date date")
        coverage_pct(expected, existing).show(truncate=False)
    elif args.command == "verify":
        from ds_raster_pipelines_spark import corpus
        from ds_raster_pipelines_spark.sources.images import decode_verify

        images = spark.read.parquet(corpus.materialized_images(spark, args.sf_dir))
        rep = decode_verify(images.limit(2000))
        from pyspark.sql import functions as F

        rep.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("caption_ok"), 0).otherwise(1)).alias("caption_bad"),
            F.sum(F.when(F.col("psnr") >= 40.0, 0).otherwise(1)).alias("psnr_bad"),
        ).show(truncate=False)
    elif args.command == "cog-sink":
        # validate → re-encode to tiled-TIFF-with-overview bytes → write
        # (reference pipeline.py:262-293: validate_dataset then save COGs)
        from pyspark.sql import functions as F

        from ds_raster_pipelines_spark import corpus
        from ds_raster_pipelines_spark.sinks import write_cog_corpus

        images = spark.read.parquet(corpus.materialized_images(spark, args.sf_dir))
        report = images.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("w") == corpus.TILE_W, 0).otherwise(1)).alias("bad_w"),
            F.sum(F.when(F.col("h") == corpus.TILE_H, 0).otherwise(1)).alias("bad_h"),
            F.sum(F.when(F.col("bytes").isNull(), 1).otherwise(0)).alias("null_bytes"),
        )
        ok = write_cog_corpus(images, report, args.out)
        n = spark.read.parquet(args.out).count() if ok else 0
        print(json.dumps({"written": ok, "out": args.out, "rows": n}))
        if not ok:
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
