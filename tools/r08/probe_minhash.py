"""Session-4 probe: stage-by-stage cost of the minhash chain (guide §1.4).
Measurement-only; not part of the driver contract."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from ds_raster_pipelines_spark.session import get_spark  # noqa: E402
from ds_raster_pipelines_spark.operators import dedup as D  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark(f"probe_minhash_{CPUS}", cpus=CPUS)
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
docs.write.format("noop").mode("overwrite").save()  # warm scan


def t(label, df, reps=3):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"probe: {label}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(f"{best:8.3f}  {label}", flush=True)
    return best


n = docs.count()
words = D.tokenize(docs)
nw = words.count()
print(f"docs={n} distinct-words-rows={nw}")

t("docs scan", docs)
t("tokenize distinct", D.tokenize(docs))
t("tokenize raw", D.tokenize(docs, distinct=False))
sigs = D.minhash_signatures(docs, strategy="md5")
t("signatures (raw words -> md5 -> agg)", sigs)
cand = D.lsh_candidate_pairs(sigs, max_bucket=50)
t("lsh candidates (fresh persist)", cand)
print("n_cand =", cand.count())
t("verified full", D.minhash_dedup_pairs(docs, strategy="md5", threshold=0.5, max_bucket=50))

# CC timing: construction is execution
for _ in range(3):
    t0 = time.time()
    stats = {}
    cand2 = D.lsh_candidate_pairs(
        D.minhash_signatures(docs, strategy="md5"), max_bucket=50
    )
    cc = D.connected_components(cand2, stats=stats)
    cc.write.format("noop").mode("overwrite").save()
    print(f"{time.time()-t0:8.3f}  dedup_components full (rounds={stats.get('rounds')})", flush=True)
