"""Session-4 probe: where zonal_pixel_stats_nc's time goes."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from ds_raster_pipelines_spark.session import get_spark  # noqa: E402
from ds_raster_pipelines_spark import corpus  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark(f"probe_nc_{CPUS}", cpus=CPUS)
path = corpus.materialized_images_fmt(spark, SF_DIR, "nc")
df = spark.read.parquet(path)
print("rows:", df.count(), "cols:", df.columns)
import subprocess
print(subprocess.run(["du", "-sh", path.replace("file:", "")], capture_output=True, text=True).stdout)


def t(label, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"probe: {label}")
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{best:8.3f}  {label}", flush=True)


def noop(d):
    d.write.format("noop").mode("overwrite").save()


t("full scan all cols (JVM)", lambda: noop(df))
t("scan blob col only (JVM)", lambda: noop(df.select("data")) if "data" in df.columns else noop(df))

# what the query scans after prune
images = corpus.footprint_cols_for_images(spark.read.parquet(path))
print("image cols:", images.columns)

from ds_raster_pipelines_spark.operators.raster import zonal_pixel_stats  # noqa: E402
q = zonal_pixel_stats(images, corpus.admin_df(spark, offset=0.03), res=6)
t("full query", lambda: noop(q))

# passthrough mapInArrow over same columns the kernel sees


def passthrough(it):
    yield from it


sel = images
t("passthrough ALL image cols", lambda: noop(sel.mapInArrow(passthrough, sel.schema)))
