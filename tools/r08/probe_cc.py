"""Session-4 probe: where does a CC round's time go? Measurement-only."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from ds_raster_pipelines_spark.session import get_spark  # noqa: E402
from ds_raster_pipelines_spark.operators import dedup as D  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark(f"probe_cc_{CPUS}", cpus=CPUS)
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
docs.write.format("noop").mode("overwrite").save()

cand = D.lsh_candidate_pairs(D.minhash_signatures(docs, strategy="md5"), max_bucket=50)

t0 = time.time()
sym = cand.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).unionByName(
    cand.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
)
sym = sym.unionByName(sym.select("a").distinct().select("a", F.col("a").alias("b")))
n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
sym = sym.repartition(n_shuffle, "b").localCheckpoint(eager=True)
print(f"{time.time()-t0:8.3f}  sym checkpoint (includes cand compute)", flush=True)

t0 = time.time()
labels = sym.groupBy(F.col("a").alias("node")).agg(F.min("b").alias("lbl")).localCheckpoint(eager=False)
s = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]
print(f"{time.time()-t0:8.3f}  init labels + sum  (sum={s})", flush=True)

for r in range(3):
    t0 = time.time()
    stepped = (
        sym.join(labels.withColumnRenamed("node", "b"), "b")
        .groupBy(F.col("a").alias("node"))
        .agg(F.min("lbl").alias("lbl"))
    )
    t1 = time.time()
    stepped_ckpt = stepped.localCheckpoint(eager=True)
    t2 = time.time()
    new_labels = (
        stepped_ckpt.join(
            stepped_ckpt.select(F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")),
            "lbl",
        )
        .select("node", F.col("lbl2").alias("lbl"))
        .localCheckpoint(eager=False)
    )
    s = new_labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]
    t3 = time.time()
    labels = new_labels
    print(
        f"round {r}: build {t1-t0:6.3f}  stepped-ckpt {t2-t1:6.3f}  double+sum {t3-t2:6.3f}  (sum={s})",
        flush=True,
    )
