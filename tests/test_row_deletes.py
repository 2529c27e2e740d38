"""Iceberg-style row-level deletes on the snapshot layer (r7, VERDICT r6
item 5): position + equality deletes, merge-on-read, time travel across
deletes, compaction of delete-heavy partitions, PII-erasure end-to-end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ds_raster_pipelines_spark.streaming.incremental import IncrementalRun


def _mk(spark, tmp_path, parts=(0, 1), rows_per_part=20):
    run = IncrementalRun(spark, str(tmp_path / "tbl"))
    for p in parts:
        df = spark.range(p * 1000, p * 1000 + rows_per_part).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        run.commit_partition(p, df, cell_col="k")
    return run


def _keys(df):
    return sorted(r["k"] for r in df.select("k").collect())


def test_position_delete_removes_rows_and_is_merge_on_read(spark, tmp_path):
    run = _mk(spark, tmp_path)
    pre = run.current_snapshot_id()
    all_keys = _keys(run.read())
    d = run.delete_rows(F.col("k").isin(3, 5, 1007))
    assert d["n_rows"] == 3
    assert _keys(run.read()) == [k for k in all_keys if k not in (3, 5, 1007)]
    # merge-on-read: the data files were NOT rewritten
    assert not run.verify(cell_col="k").count()
    # time travel to the pre-delete snapshot still shows the rows
    assert _keys(run.read_at(pre)) == all_keys


def test_position_delete_is_idempotent_on_dead_rows(spark, tmp_path):
    run = _mk(spark, tmp_path)
    run.delete_rows(F.col("k") == 3)
    d2 = run.delete_rows(F.col("k").isin(3, 4))  # 3 already dead
    assert d2["n_rows"] == 1
    assert 3 not in _keys(run.read()) and 4 not in _keys(run.read())


def test_equality_delete_and_sequence_rule(spark, tmp_path):
    run = _mk(spark, tmp_path)
    run.delete_where("k", [2, 1001])
    got = _keys(run.read())
    assert 2 not in got and 1001 not in got
    # sequence rule: a partition REWRITTEN after the delete may legitimately
    # re-insert a deleted key — the older equality delete must not apply
    df = spark.range(0, 5).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    run.commit_partition(0, df, cell_col="k")
    got = _keys(run.read())
    assert 2 in got  # re-inserted, new version is newer than the delete
    assert 1001 not in got  # part 1 never rewritten: delete still applies


def test_pii_erasure_end_to_end(spark, tmp_path):
    """The PII-erasure request: equality-delete user keys, verify gone from
    current reads, still reconstructible only via explicit time travel,
    then compaction + expire makes the erasure physical."""
    run = _mk(spark, tmp_path)
    pre = run.current_snapshot_id()
    run.delete_where("k", [7, 8, 1013])
    assert all(k not in _keys(run.read()) for k in (7, 8, 1013))
    assert 7 in _keys(run.read_at(pre))  # audit trail until expired
    for p in (0, 1):
        run.compact_partition(p, cell_col="k")
    run.expire_snapshots(run.current_snapshot_id())
    # post-compaction live files physically lack the keys
    raw = spark.read.parquet(str(tmp_path / "tbl" / "data"))
    assert all(k not in _keys(raw) for k in (7, 8, 1013))


def test_compaction_preserves_visible_content_and_checksums(spark, tmp_path):
    run = _mk(spark, tmp_path)
    run.delete_rows(F.col("k") % 5 == 0)
    run.delete_where("v", [3])
    before = sorted(
        (r["k"], r["v"]) for r in run.read().select("k", "v").collect()
    )
    pre_compact = run.current_snapshot_id()
    for p in (0, 1):
        run.compact_partition(p, cell_col="k")
    after = sorted(
        (r["k"], r["v"]) for r in run.read().select("k", "v").collect()
    )
    assert after == before  # compaction rewrote files, not content
    assert not run.verify(cell_col="k").count()  # manifest re-checksummed
    # time travel: every pre-compaction state still reconstructs exactly,
    # including states that had the deletes merged on read
    assert sorted(
        (r["k"], r["v"]) for r in run.read_at(pre_compact).select("k", "v").collect()
    ) == before
    # and the ORIGINAL pre-delete state is bit-exact too
    first_commit = 2  # two commits happened
    assert len(_keys(run.read_at(first_commit))) == 40


def test_position_delete_survives_partition_archive_rename(spark, tmp_path):
    """Position deletes address file BASENAMES, so archiving a partition
    version (directory rename) must not detach them under time travel."""
    run = _mk(spark, tmp_path)
    run.delete_rows(F.col("k") == 4)
    post_delete = run.current_snapshot_id()
    # rewrite part 0 -> the deleted-against version gets archived (renamed)
    df = spark.range(500, 510).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    run.commit_partition(0, df, cell_col="k")
    # time travel to post-delete, pre-rewrite: archived files, delete applies
    got = _keys(run.read_at(post_delete))
    assert 4 not in got and 0 in got and 500 not in got


def test_delete_then_evolve_schema_interplay(spark, tmp_path):
    run = _mk(spark, tmp_path)
    run.delete_rows(F.col("k") == 1)
    run.evolve_schema("flag", "int", 9)
    got = run.read()
    assert "flag" in got.columns
    assert 1 not in _keys(got)
    assert {r["flag"] for r in got.select("flag").collect()} == {9}


def test_metrics_and_verify_untouched_by_deletes(spark, tmp_path):
    run = _mk(spark, tmp_path)
    m0 = run.metrics()
    run.delete_rows(F.col("k") < 3)
    # lineage is over durable data files (merge-on-read contract)
    assert run.metrics()["rows_total"] == m0["rows_total"]
    assert not run.verify(cell_col="k").count()


def test_read_cell_range_prunes_partitions(spark, tmp_path):
    """Manifest-range pruning: only intersecting partitions' files are
    listed; deletes still merge on read for kept partitions."""
    run = _mk(spark, tmp_path, parts=(0, 1, 2), rows_per_part=10)
    # parts hold k in [0..9], [1000..1009], [2000..2009]
    pruned = run.read_cell_range(1000, 1999)
    assert _keys(pruned) == list(range(1000, 1010))
    # file-skipping proof: every input file comes from part=1
    assert all("part=1" in f for f in pruned.inputFiles())
    run.delete_rows(F.col("k") == 1003)
    assert 1003 not in _keys(run.read_cell_range(1000, 1999))
    # a range spanning two parts keeps exactly those two (inputFiles also
    # lists the tiny delete files — look only at data-partition paths)
    two = run.read_cell_range(5, 1005)
    data_parts = {
        f.split("/part=")[1][0] for f in two.inputFiles() if "/part=" in f
    }
    assert data_parts == {"0", "1"}
    with pytest.raises(ValueError, match="no partition"):
        run.read_cell_range(5000, 6000)
