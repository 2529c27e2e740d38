"""Custom stateful streaming operator (SURVEY §2.9 / brief: stateful ops
beyond built-in windowed aggregation → ``applyInPandasWithState``).

``running_user_totals`` keeps per-user state (event count + last-seen
timestamp) ALIVE ACROSS MICRO-BATCHES and emits the running totals each
time the user appears — the canonical shape for streaming sessionization,
feature freshness counters, or dedup-by-key state. The input is split
into several files and streamed with ``maxFilesPerTrigger=1`` so multiple
micro-batches genuinely exercise state persistence (a single-batch run
would never read state back).

Consistency contract (tested): for every user, the FINAL emitted totals
equal the batch ``groupBy(user).agg(count, max(ts))`` — the stream is an
incremental evaluation of the same aggregate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, last_ts_us bigint"
STATE_SCHEMA = "n bigint, last_us bigint"


def _update(key, pdfs, state: GroupState):
    n, last_us = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        batch_max = int(pd.to_datetime(pdf["ts"]).astype("int64").max() // 1000)
        last_us = max(last_us, batch_max)
    state.update((n, last_us))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "last_ts_us": [last_us]})


def running_user_totals_stream(
    spark: SparkSession,
    events: DataFrame,
    stage_dir: str,
    n_files: int = 4,
    query_name: str = "user_totals",
) -> DataFrame:
    """Stream ``events`` through per-user GroupState in ``n_files``
    micro-batches; returns every emitted running-total row (the final
    row per user — max n_events — is the completed aggregate)."""
    events.select("user_id", "ts").repartition(n_files).write.mode("overwrite").parquet(
        stage_dir
    )
    from pyspark.sql import functions as F

    schema = spark.read.parquet(stage_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(stage_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    totals = stream.groupBy("user_id").applyInPandasWithState(
        _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
    q = totals.writeStream.outputMode("update").format("memory").queryName(query_name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def user_totals_batch(events: DataFrame) -> DataFrame:
    """The batch twin: what the stream's final state must equal."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max(F.col("ts").cast("timestamp")))).alias("last_ts_us"),
    )
