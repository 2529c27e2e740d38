"""Background builder for the 128M-tile scaling corpus (resumable chunks).

The corpus build is per-chunk resumable (corpus.materialized_images_n
writes a _CHUNKS_DONE manifest after each committed append job), so a
sporadic python-worker crash mid-chunk costs one chunk, not the build:
retry with a fresh SparkSession and it continues from the manifest.
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ds_raster_pipelines_spark.session import get_spark
from ds_raster_pipelines_spark import corpus

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000_000
retries = int(os.environ.get("SPARK_GRAFT_BUILD_RETRIES", "6"))
t0 = time.time()
for attempt in range(retries):
    spark = get_spark(
        "big_corpus_build",
        cpus=32,
        extra_conf={"spark.python.worker.faulthandler.enabled": "true"},
    )
    try:
        p = corpus.materialized_images_n(spark, n)
        print(f"DONE {p} in {time.time()-t0:.0f}s (attempt {attempt + 1})", flush=True)
        break
    except Exception:
        traceback.print_exc()
        print(f"RETRY after attempt {attempt + 1}", flush=True)
        spark.stop()
        time.sleep(10)
else:
    print("FAILED: retries exhausted", flush=True)
    sys.exit(1)
