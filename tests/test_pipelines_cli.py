"""Run-mode plan tests — the Spark analog of the reference's mocked
orchestration tests (tests/test_era5_pipeline.py:44-66: which units of
work does a mode schedule), plus the dispatcher smoke."""

from __future__ import annotations

import datetime as dt

import pytest


def test_ingest_modes_and_resume(spark, tmp_path):
    from ds_raster_pipelines_spark.plans.pipelines import IngestPipeline

    start, end = dt.date(2020, 1, 1), dt.date(2020, 1, 4)
    pipe = IngestPipeline(spark, str(tmp_path / "out"), start, end, tiles_per_day=200)

    # plan-level behavior per mode (the reference's call-count assertions)
    assert pipe.plan("full") == pipe.expected_dates()
    assert pipe.plan("update") == [end]
    assert pipe.plan("backfill") == pipe.expected_dates()  # nothing committed yet

    # partial run (simulated kill after 2 dates)
    for d in pipe.expected_dates()[:2]:
        pipe.process_date(d)
    assert pipe.plan("backfill") == pipe.expected_dates()[2:]

    # resume completes only the gap
    metrics = pipe.run_pipeline("backfill")
    assert metrics["processed_dates"] == [d.isoformat() for d in pipe.expected_dates()[2:]]
    assert metrics["partitions"] == 4 and metrics["rows_total"] == 800
    assert pipe.plan("backfill") == []

    # lineage intact; per-partition metrics balanced
    assert pipe.run.verify(cell_col="cell_id").count() == 0
    assert metrics["skew_ratio"] == 1.0

    # update mode re-plans just the newest date
    assert pipe.plan("update") == [end]


def test_validation_gate_blocks_bad_write(spark, tmp_path):
    from ds_raster_pipelines_spark.plans.pipelines import IngestPipeline
    from pyspark.sql import functions as F

    pipe = IngestPipeline(spark, str(tmp_path / "o2"), dt.date(2020, 1, 1), dt.date(2020, 1, 1))
    good = pipe.build_date(dt.date(2020, 1, 1))
    # corrupt the CRS → gate must refuse
    bad_pipe = IngestPipeline(spark, str(tmp_path / "o3"), dt.date(2020, 1, 1), dt.date(2020, 1, 1))
    bad_pipe.build_date = lambda d: good.withColumn("crs", F.lit("EPSG:3857"))
    with pytest.raises(ValueError, match="validation gate failed"):
        bad_pipe.process_date(dt.date(2020, 1, 1))


def test_cli_dispatcher(tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable,
            "run_pipeline.py",
            "ingest",
            "--out",
            str(tmp_path / "cli_out"),
            "--start",
            "2020-01-01",
            "--end",
            "2020-01-02",
            "--cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import json

    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["partitions"] == 2 and metrics["rows_total"] == 1000


def test_cli_cog_sink(tmp_path):
    """The processed-output flow end-to-end from the CLI: validate →
    COG re-encode → write (reference run_pipeline's processed upload)."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable,
            "run_pipeline.py",
            "cog-sink",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            str(tmp_path / "cogs"),
            "--cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["written"] and res["rows"] > 0


def test_remote_fetch_blobs(spark, tmp_path):
    """S5/S6/S9 pluggable source layer: distributed fetch over a manifest,
    errors captured as data (resumable), real file:// adapter."""
    import pandas as pd

    from ds_raster_pipelines_spark.sources.remote import (
        fetch_blobs,
        file_fetcher,
        with_retry,
    )

    paths = []
    for k in range(5):
        p = tmp_path / f"obj{k}.bin"
        p.write_bytes(bytes([k]) * (k + 1))
        paths.append(str(p))
    manifest = spark.createDataFrame(
        pd.DataFrame({"ref": paths + [str(tmp_path / "missing.bin")]})
    )
    out = fetch_blobs(manifest, fetcher=file_fetcher, concurrency=3).toPandas()
    ok = out[out.status == "ok"].sort_values("ref").reset_index(drop=True)
    assert len(ok) == 5 and ok["n_bytes"].tolist() == [1, 2, 3, 4, 5]
    bad = out[out.status == "error"]
    assert len(bad) == 1 and "FileNotFoundError" in bad.iloc[0]["err"]
    assert bad.iloc[0]["bytes"] is None
    # retry wrapper: flaky fetcher succeeds on attempt 2
    calls = {"n": 0}

    def flaky(ref):
        calls["n"] += 1
        if calls["n"] < 2:
            raise OSError("transient")
        return b"ok"

    assert with_retry(flaky, attempts=3, backoff_s=0.0)("x") == b"ok"
