"""Background builder for the 128M-tile scaling corpus (resumable chunks)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ds_raster_pipelines_spark.session import get_spark
from ds_raster_pipelines_spark import corpus

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000_000
t0 = time.time()
spark = get_spark("big_corpus_build", cpus=32)
p = corpus.materialized_images_n(spark, n)
print(f"DONE {p} in {time.time()-t0:.0f}s", flush=True)
