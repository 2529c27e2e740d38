"""Checkpointed incremental batch with per-partition lineage manifests.

North-rule requirement: "jobs checkpoint per-Iceberg-partition with lineage
manifests (cell range, row count, checksum) so a killed run resumes without
recompute, and emit per-partition throughput/skew metrics."

Generalizes the reference's read-through raw cache + backfill anti-join
(``/root/reference/src/pipelines/pipeline.py:126-152`` and ``:173-213``):

* the OUTPUT is a directory of parquet partitions keyed by an integer
  partition id (date bucket / cell bucket);
* the MANIFEST is a small parquet table, one row per completed partition:
  (part, n_rows, checksum, min_cell, max_cell) — checksum is an
  order-insensitive sum of per-row xxhash64 (mod 2^61-1), so it is
  identical across parallelism levels;
* RESUME = plan partitions LEFT ANTI manifest — only missing partitions
  recompute. A killed run leaves a valid manifest prefix (each partition's
  manifest row is written only after its data commits).

All plain DataFrame code; on Iceberg the manifest maps onto snapshot
metadata, but the layer works on bare parquet directories too (this
sandbox has no Iceberg jars — import-gated by design, SURVEY §7).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 31-bit terms: an int64 sum stays exact for up to ~2^32 rows/partition
CHECKSUM_P = (1 << 31) - 1

MANIFEST_SCHEMA = (
    "part int, n_rows bigint, checksum bigint, min_cell bigint, max_cell bigint"
)


def row_checksum(df: DataFrame, cols: list[str] | None = None) -> F.Column:
    """Order-insensitive row-set checksum term: pmod(xxhash64(cols), p)."""
    cols = cols or df.columns
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(CHECKSUM_P))


def partition_manifest(df: DataFrame, part_col: str, cell_col: str | None = None) -> DataFrame:
    """Per-partition lineage rows for ``df`` (one aggregate pass)."""
    value_cols = [c for c in df.columns if c != part_col]
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_checksum(df, value_cols)).alias("checksum"),
    ]
    if cell_col and cell_col in df.columns:
        aggs += [F.min(cell_col).alias("min_cell"), F.max(cell_col).alias("max_cell")]
    else:
        aggs += [F.lit(None).cast("long").alias("min_cell"), F.lit(None).cast("long").alias("max_cell")]
    return df.groupBy(F.col(part_col).cast("int").alias("part")).agg(*aggs)


class IncrementalRun:
    """Drive a partitioned computation with checkpoint/resume.

    >>> run = IncrementalRun(spark, out_dir)
    >>> pending = run.pending_partitions(all_parts)      # anti-join manifest
    >>> for p in pending: run.commit_partition(p, build(p), cell_col="cell_id")
    >>> run.metrics()                                    # per-partition rows/skew
    """

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.manifest_dir = os.path.join(out_dir, "manifest")

    # -- manifest ---------------------------------------------------------

    def manifest(self) -> DataFrame:
        if not os.path.exists(self.manifest_dir):
            # a crash inside commit_partition's swap window can leave only
            # the renamed-aside backup; recover it so resume degrades to
            # "recompute the in-flight partition", never a missing-path error
            old = self.manifest_dir + "._old"
            if os.path.exists(old):
                os.rename(old, self.manifest_dir)
            else:
                return self.spark.createDataFrame([], MANIFEST_SCHEMA)
        return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.manifest_dir)

    def pending_partitions(self, planned: list[int]) -> list[int]:
        """Planned partitions not yet committed — the resume anti-join
        (reference pipeline.py:210)."""
        import pandas as pd

        # pandas→Arrow local relation (the pickled-list path costs seconds
        # per evaluation on this box — see cover_local in operators/pip.py)
        plan_df = self.spark.createDataFrame(
            pd.DataFrame({"part": [int(p) for p in planned]}), "part int"
        )
        missing = plan_df.join(self.manifest().select("part"), "part", "left_anti")
        return sorted(r["part"] for r in missing.collect())

    # -- commit ------------------------------------------------------------

    def commit_partition(self, part: int, df: DataFrame, cell_col: str | None = None) -> dict:
        """Write one partition's data, then its manifest row (write order
        is the crash-safety contract: data before manifest; a partition
        without a manifest row is recomputed on resume).

        Idempotent under LATE RE-DELIVERY (the reference FloodScan feed
        ships a rolling 90-day archive — floodscan_pipeline.py:54,424 —
        so already-committed dated partitions arrive again): committing
        an existing ``part`` overwrites its data directory and REPLACES
        its manifest row instead of appending a duplicate. A crash between
        the data overwrite and the manifest swap leaves the old manifest
        row pointing at new data — ``verify()`` flags exactly that
        partition for recompute, so the resume contract holds."""
        part = int(part)
        path = os.path.join(self.data_dir, f"part={part}")
        if os.path.exists(path):
            # Iceberg-style snapshot isolation: the partition's current
            # files are ARCHIVED (renamed, not deleted) under _versions
            # keyed by the snapshot that wrote them, so read_at(sid) can
            # reconstruct any earlier table state until expire_snapshots
            self._archive_current(part)
        df.write.mode("overwrite").parquet(path)
        # lineage is computed from the WRITTEN files (checksums what is
        # durable, not what was planned), then committed to the manifest
        written = self.spark.read.parquet(path).withColumn("part", F.lit(part))
        m = partition_manifest(written, "part", cell_col)
        existing = self.manifest()
        if existing.where(F.col("part") == part).limit(1).count():
            # re-delivery upsert: rewrite the (small) manifest without the
            # stale row, then swap directories; the tmp write materializes
            # the merged rows BEFORE the old directory is removed
            import shutil

            merged = existing.where(F.col("part") != part).unionByName(m)
            tmp = self.manifest_dir + "._tmp"
            merged.coalesce(1).write.mode("overwrite").parquet(tmp)
            # swap keeps a readable manifest at EVERY crash point: the old
            # dir is renamed aside (not deleted) before tmp moves in, so a
            # crash mid-swap leaves either the old or the new manifest in
            # place — never a missing path (resume degrades to "recompute
            # that partition", as the contract promises).
            old = self.manifest_dir + "._old"
            if os.path.exists(old):
                shutil.rmtree(old)  # leftover from a prior crashed swap
            os.rename(self.manifest_dir, old)
            os.rename(tmp, self.manifest_dir)
            shutil.rmtree(old)
        else:
            m.write.mode("append").parquet(self.manifest_dir)
        self._append_snapshot(part, m.collect()[0].asDict())
        return m.collect()[0].asDict()

    # -- snapshots (Iceberg-style time travel) ------------------------------

    @property
    def _snapshot_log(self) -> str:
        return os.path.join(self.out_dir, "snapshots.jsonl")

    @property
    def _versions_dir(self) -> str:
        return os.path.join(self.out_dir, "_versions")

    def snapshots(self) -> list[dict]:
        """The append-only snapshot log: one row per commit —
        (snapshot_id, parent_id, part, n_rows, checksum). The table state
        AT snapshot s = for each partition, the last commit with
        snapshot_id <= s."""
        import json

        if not os.path.exists(self._snapshot_log):
            return []
        with open(self._snapshot_log) as f:
            return [json.loads(line) for line in f if line.strip()]

    def current_snapshot_id(self) -> int:
        log = self.snapshots()
        return log[-1]["snapshot_id"] if log else 0

    def _append_snapshot(self, part: int, manifest_row: dict) -> int:
        import json

        sid = self.current_snapshot_id() + 1
        row = {
            "snapshot_id": sid,
            "parent_id": sid - 1,
            "operation": "commit",
            "part": int(part),
            "n_rows": int(manifest_row["n_rows"]),
            "checksum": int(manifest_row["checksum"]),
        }
        # single-writer append (the runner owns the table, like an
        # Iceberg catalog's atomic swap); fsync'd so a crash after the
        # data commit still leaves a consistent log prefix
        with open(self._snapshot_log, "a") as f:
            f.write(json.dumps(row) + "\n")
            f.flush()
            os.fsync(f.fileno())
        return sid

    def _last_commit_sid(self, part: int) -> int | None:
        sids = [
            s["snapshot_id"]
            for s in self.snapshots()
            if s["part"] == part and s.get("operation", "commit") == "commit"
        ]
        return max(sids) if sids else None

    def _archive_current(self, part: int) -> None:
        sid = self._last_commit_sid(part)
        if sid is None:
            return  # data dir exists but never committed: crashed write
        dst = os.path.join(self._versions_dir, f"part={part}", f"v={sid}")
        if os.path.exists(dst):
            return  # already archived (idempotent re-run)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(os.path.join(self.data_dir, f"part={part}"), dst)

    def read_at(self, snapshot_id: int) -> DataFrame:
        """TIME TRAVEL: the table exactly as of ``snapshot_id``. For each
        partition, the visible version is its last commit <= snapshot_id;
        replaced versions are served from the archive, current ones from
        the live directory."""
        from functools import reduce

        log = [s for s in self.snapshots() if s["snapshot_id"] <= snapshot_id]
        if not log:
            raise ValueError(f"no snapshot <= {snapshot_id}")
        visible: dict[int, int] = {}
        for s in log:
            if s.get("operation", "commit") == "commit":
                visible[s["part"]] = s["snapshot_id"]
        parts_df = []
        for part, sid in sorted(visible.items()):
            if self._last_commit_sid(part) == sid:
                path = os.path.join(self.data_dir, f"part={part}")
            else:
                path = os.path.join(self._versions_dir, f"part={part}", f"v={sid}")
            pdf = self._read_version(path, part, version_sid=sid, as_of_sid=snapshot_id)
            # schema AS OF the requested snapshot (Iceberg time travel reads
            # with the snapshot's schema): columns added later are absent;
            # columns added earlier that this version's files predate read
            # as their declared default
            parts_df.append(self._apply_evolutions(pdf, snapshot_id))
        return reduce(lambda a, b: a.unionByName(b), parts_df)

    def expire_snapshots(self, older_than_sid: int) -> int:
        """Iceberg maintenance: drop archived versions only visible to
        snapshots < older_than_sid. Returns the number of version dirs
        removed. Live data and the snapshot log itself are untouched (the
        log stays the audit trail; time travel below the horizon errors
        on the archived reads)."""
        import shutil

        removed = 0
        if not os.path.exists(self._versions_dir):
            return 0
        # an archived version v of part p is still needed iff some kept
        # snapshot s >= older_than_sid resolves p -> v
        needed: set[tuple[int, int]] = set()
        full_log = self.snapshots()
        # versions resolve through COMMIT rows only, but every kept
        # snapshot id (delete snapshots included) is a time-travel target
        log = [s for s in full_log if s.get("operation", "commit") == "commit"]
        all_sids = [s["snapshot_id"] for s in full_log]
        for keep_sid in [s for s in all_sids if s >= older_than_sid]:
            vis: dict[int, int] = {}
            for s in log:
                if s["snapshot_id"] <= keep_sid:
                    vis[s["part"]] = s["snapshot_id"]
            needed.update(vis.items())
        for pdir in os.listdir(self._versions_dir):
            part = int(pdir.split("=")[1])
            pfull = os.path.join(self._versions_dir, pdir)
            for vdir in os.listdir(pfull):
                v = int(vdir.split("=")[1])
                if (part, v) not in needed:
                    shutil.rmtree(os.path.join(pfull, vdir))
                    removed += 1
        return removed

    # -- row-level deletes (Iceberg merge-on-read) ---------------------------
    #
    # Two delete shapes, same as the Iceberg v2 spec:
    # * POSITION deletes address physical rows as (file name, row index in
    #   file) — resolved here via Spark's hidden ``_metadata`` struct
    #   (file_path + row_index). Addressed by file BASENAME, which is
    #   stable across the archive rename (_versions/part=N/v=sid) — so a
    #   position delete keeps applying to the same rows under time travel,
    #   and self-invalidates when compaction rewrites the files (dead file
    #   names simply match nothing), exactly Iceberg's behavior.
    # * EQUALITY deletes record (column, values) and apply to partition
    #   versions committed STRICTLY BEFORE the delete snapshot (the
    #   sequence-number rule): a partition rewritten after the delete has
    #   already had the rows removed — re-applying would be wrong if a
    #   deleted key is legitimately re-inserted later.
    #
    # Reads are MERGE-ON-READ: data files are never touched by a delete —
    # the scan anti-joins the (tiny, broadcast) delete files. A
    # delete-heavy partition is rewritten by ``compact_partition``.
    # Lineage/verify() checksums remain over the raw data files by design:
    # verify certifies durable bytes; deletes are metadata layered on top.

    @property
    def _deletes_dir(self) -> str:
        return os.path.join(self.out_dir, "deletes")

    def delete_entries(self) -> list[dict]:
        return [
            s for s in self.snapshots()
            if s.get("operation") in ("position_delete", "equality_delete")
        ]

    def _append_delete_snapshot(self, operation: str, n_rows: int, **extra) -> int:
        import json

        sid = self.current_snapshot_id() + 1
        row = {
            "snapshot_id": sid,
            "parent_id": sid - 1,
            "operation": operation,
            "part": -1,
            "n_rows": int(n_rows),
            "checksum": 0,
            **extra,
        }
        with open(self._snapshot_log, "a") as f:
            f.write(json.dumps(row) + "\n")
            f.flush()
            os.fsync(f.fileno())
        return sid

    def delete_rows(self, predicate: F.Column) -> dict:
        """POSITION delete: resolve ``predicate`` against the CURRENT
        table state (prior deletes already applied — re-deleting a dead
        row is a no-op by construction) to (file name, row index) pairs,
        written as one parquet delete file. O(matched rows) metadata; no
        data file is rewritten. The PII-erasure primitive."""
        sid = self.current_snapshot_id() + 1
        path = os.path.join(self._deletes_dir, f"pos-{sid}")
        hits = self.read(_with_meta=True).where(predicate).select("_file", "_pos")
        hits.coalesce(1).write.mode("overwrite").parquet(path)
        n = self.spark.read.parquet(path).count()
        real_sid = self._append_delete_snapshot("position_delete", n, path=f"pos-{sid}")
        assert real_sid == sid, "concurrent writer detected (single-writer contract)"
        return {"snapshot_id": sid, "operation": "position_delete", "n_rows": n}

    def delete_where(self, column: str, values: list) -> dict:
        """EQUALITY delete: record (column, values) as a delete file;
        applies at read to partition versions committed strictly before
        this snapshot."""
        import pandas as pd

        sid = self.current_snapshot_id() + 1
        path = os.path.join(self._deletes_dir, f"eq-{sid}")
        vals = pd.DataFrame({"v": list(values)})
        self.spark.createDataFrame(vals).coalesce(1).write.mode("overwrite").parquet(path)
        real_sid = self._append_delete_snapshot(
            "equality_delete", len(vals), path=f"eq-{sid}", column=column
        )
        assert real_sid == sid, "concurrent writer detected (single-writer contract)"
        return {"snapshot_id": sid, "operation": "equality_delete", "n_rows": len(vals)}

    def _read_version(
        self, path: str, part: int, version_sid: int, as_of_sid: int,
        keep_meta: bool = False,
    ) -> DataFrame:
        """One partition version with the deletes visible at ``as_of_sid``
        merged in (anti-joins against broadcast-small delete files).
        ``keep_meta`` retains the (_file, _pos) address columns — the
        position-delete writer needs them."""
        deletes = [d for d in self.delete_entries() if d["snapshot_id"] <= as_of_sid]
        pdf = self.spark.read.parquet(path)
        if deletes or keep_meta:
            pdf = pdf.select(
                "*",
                F.substring_index(F.col("_metadata.file_path"), "/", -1).alias("_file"),
                F.col("_metadata.row_index").alias("_pos"),
            )
        pdf = pdf.withColumn("part", F.lit(part))
        for d in deletes:
            dpath = os.path.join(self._deletes_dir, d["path"])
            if d["operation"] == "position_delete":
                dels = self.spark.read.parquet(dpath).withColumn(
                    "_file", F.substring_index(F.col("_file"), "/", -1)
                )
                pdf = pdf.join(F.broadcast(dels), ["_file", "_pos"], "left_anti")
            else:  # equality: only versions committed before the delete
                if version_sid < d["snapshot_id"] and d["column"] in pdf.columns:
                    dels = self.spark.read.parquet(dpath).select(
                        F.col("v").alias(d["column"])
                    )
                    pdf = pdf.join(F.broadcast(dels), d["column"], "left_anti")
        return pdf if keep_meta or not deletes else pdf.drop("_file", "_pos")

    def compact_partition(self, part: int, cell_col: str | None = None) -> dict:
        """Rewrite a delete-heavy partition: materialize its merged read
        (data minus visible deletes) and commit it as a NEW version
        through the normal lineage path. Post-compaction the partition's
        commit snapshot is newer than every existing delete, so equality
        deletes stop applying by the sequence rule and position deletes
        self-invalidate (new file names); time travel still reconstructs
        every pre-compaction state from the archived version."""
        sid = self._last_commit_sid(part)
        if sid is None:
            raise ValueError(f"partition {part} has no committed version")
        path = os.path.join(self.data_dir, f"part={part}")
        merged = self._read_version(
            path, part, version_sid=sid, as_of_sid=self.current_snapshot_id()
        ).drop("part")
        # STAGE the merged rows to a scratch dir before commit_partition
        # overwrites the source files (a lazy read overwriting its own
        # input self-clobbers), then commit from the staged copy —
        # distributed end to end, no driver materialization
        import shutil

        tmp = os.path.join(self.out_dir, f"_compact_part={part}")
        merged.write.mode("overwrite").parquet(tmp)
        try:
            return self.commit_partition(part, self.spark.read.parquet(tmp), cell_col)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # -- schema evolution (Iceberg add-column-with-default) -----------------

    @property
    def _schema_log(self) -> str:
        return os.path.join(self.out_dir, "schema.jsonl")

    def schema_versions(self) -> list[dict]:
        """Append-only schema log: one row per ``add_column``, stamped with
        the snapshot id at evolution time. Iceberg semantics: data files are
        NEVER rewritten; files written before the column existed read it as
        the declared default, files written after carry real values
        (including genuine NULLs, which are preserved — the default applies
        only to pre-evolution files, not to null cells)."""
        import json

        if not os.path.exists(self._schema_log):
            return []
        with open(self._schema_log) as f:
            return [json.loads(line) for line in f if line.strip()]

    def evolve_schema(self, name: str, dtype: str, default) -> dict:
        """ADD COLUMN ``name dtype DEFAULT default`` as pure metadata —
        O(1), no data rewrite (the Iceberg contract; reference pipelines
        gain columns across dataset revisions, e.g. floodscan SFED→MFED
        band additions)."""
        import json

        if any(ev["name"] == name for ev in self.schema_versions()):
            raise ValueError(f"column {name!r} already added")
        row = {
            "name": name,
            "type": dtype,
            "default": default,
            "snapshot_id": self.current_snapshot_id(),
        }
        os.makedirs(self.out_dir, exist_ok=True)
        with open(self._schema_log, "a") as f:
            f.write(json.dumps(row) + "\n")
            f.flush()
            os.fsync(f.fileno())
        return row

    def _apply_evolutions(self, df: DataFrame, as_of_sid: int) -> DataFrame:
        """Fill columns added strictly before ``as_of_sid`` that this
        (partition-version) dataframe's files predate (an evolution is
        stamped with the snapshot id current at evolution time, so it
        becomes visible from the NEXT snapshot onward). Per-partition-
        version granularity keeps genuine NULLs distinct from missing
        columns."""
        for ev in self.schema_versions():
            if ev["snapshot_id"] >= as_of_sid:
                continue
            if ev["name"] not in df.columns:
                df = df.withColumn(
                    ev["name"], F.lit(ev["default"]).cast(ev["type"])
                )
        return df

    # -- hidden partitioning (Iceberg partition transforms) -----------------

    @property
    def _spec_path(self) -> str:
        return os.path.join(self.out_dir, "partition_spec.json")

    def set_partition_spec(self, source: str, transform: str, n: int | None = None) -> dict:
        """Declare a HIDDEN partition transform: the partition id is derived
        from ``source`` by ``transform`` (``bucket(n)`` = pmod(xxhash64, n),
        ``truncate(n)`` = floor-division width n, ``month`` = y*12+m on a
        date). Users query by the source column; they never see or manage
        the derived ``part`` — the engine maps predicates to partitions
        (``prune_for``), the Iceberg idea that kills accidental full scans."""
        import json

        if transform not in ("bucket", "truncate", "month"):
            raise ValueError(f"unknown transform {transform!r}")
        if transform in ("bucket", "truncate") and not n:
            raise ValueError(f"{transform} requires n")
        spec = {"source": source, "transform": transform, "n": n}
        os.makedirs(self.out_dir, exist_ok=True)
        with open(self._spec_path, "w") as f:
            json.dump(spec, f)
        return spec

    def partition_spec(self) -> dict | None:
        import json

        if not os.path.exists(self._spec_path):
            return None
        with open(self._spec_path) as f:
            return json.load(f)

    def partition_expr(self) -> F.Column:
        """The transform as a pure Column (executor-side, codegen'd)."""
        spec = self.partition_spec()
        if spec is None:
            raise ValueError("no partition spec set")
        src = F.col(spec["source"])
        if spec["transform"] == "bucket":
            return F.pmod(F.xxhash64(src), F.lit(spec["n"])).cast("int")
        if spec["transform"] == "truncate":
            return F.floor(src / spec["n"]).cast("int")
        return (F.year(src) * 12 + F.month(src) - 1).cast("int")

    def transform_values(self, values: list) -> list[int]:
        """Driver-side twin of ``partition_expr`` for pruning — evaluated
        through the SAME Column expression over a bounded local relation,
        so twin divergence is impossible by construction (values lists are
        predicate literals: small)."""
        import pandas as pd

        spec = self.partition_spec()
        local = self.spark.createDataFrame(
            pd.DataFrame({spec["source"]: values})
        )
        return [r["p"] for r in local.select(self.partition_expr().alias("p")).collect()]

    def prune_for(self, values: list) -> list[int]:
        """Partition ids a query filtering ``source IN values`` must scan —
        intersected with what the manifest says exists."""
        want = set(self.transform_values(values))
        have = {r["part"] for r in self.manifest().select("part").collect()}
        return sorted(want & have)

    def commit_transformed(self, df: DataFrame, cell_col: str | None = None) -> list[dict]:
        """Commit ``df`` under the hidden partition spec: derive each row's
        partition from the transform, commit each derived partition through
        the normal lineage path. The distinct-part collect is bounded by the
        partition count (Iceberg metadata scale, not data scale)."""
        with_part = df.withColumn("__hp", self.partition_expr())
        parts = sorted(
            r["__hp"] for r in with_part.select("__hp").distinct().collect()
        )
        out = []
        for p in parts:
            out.append(
                self.commit_partition(
                    p, with_part.where(F.col("__hp") == p).drop("__hp"), cell_col
                )
            )
        return out

    # -- reads -------------------------------------------------------------

    def read(self, _with_meta: bool = False) -> DataFrame:
        """Current table state under the CURRENT schema. With no evolutions
        and no deletes this is the raw fast path; with evolutions it goes
        through the per-partition-version reader so pre-evolution files
        surface declared defaults while post-evolution NULLs stay NULL;
        with row-level deletes the scan merges them on read."""
        if _with_meta or self.delete_entries():
            from functools import reduce

            head = self.current_snapshot_id()
            visible: dict[int, int] = {}
            for s in self.snapshots():
                if s.get("operation", "commit") == "commit":
                    visible[s["part"]] = s["snapshot_id"]
            parts_df = []
            for part, sid in sorted(visible.items()):
                path = os.path.join(self.data_dir, f"part={part}")
                pdf = self._read_version(
                    path, part, version_sid=sid, as_of_sid=head, keep_meta=_with_meta
                )
                parts_df.append(self._apply_evolutions(pdf, head + 1))
            if not parts_df:
                raise ValueError("empty table: nothing committed yet")
            df = reduce(lambda a, b: a.unionByName(b), parts_df)
            for ev in self.schema_versions():
                if ev["name"] not in df.columns:
                    df = df.withColumn(ev["name"], F.lit(ev["default"]).cast(ev["type"]))
            return df
        if not self.schema_versions():
            return self.spark.read.parquet(self.data_dir)
        df = self.read_at(self.current_snapshot_id())
        # current-table reads use the CURRENT schema (Iceberg: schema
        # changes are metadata versions, not snapshots) — an evolution
        # stamped at the head snapshot, with no commit after it yet, still
        # surfaces here; no existing file can carry it, so a blanket add
        # is exact
        for ev in self.schema_versions():
            if ev["name"] not in df.columns:
                df = df.withColumn(
                    ev["name"], F.lit(ev["default"]).cast(ev["type"])
                )
        return df

    def read_cell_range(self, lo: int, hi: int, _with_meta: bool = False) -> DataFrame:
        """MANIFEST-PRUNED read: scan only partitions whose lineage
        [min_cell, max_cell] intersects [lo, hi] — the Iceberg manifest
        file-skipping idea on this layer's own per-partition stats. The
        prune is a driver-side pass over the (partition-count-sized)
        manifest; skipped partitions' files are never listed, let alone
        read. Deletes/evolutions still merge on read for the kept
        partitions. Rows inside a kept partition that fall outside the
        range are NOT filtered here (min/max is a file-skipping bound, not
        a predicate) — callers compose `.where()` for exactness, same as
        a parquet reader with row-group stats."""
        keep = [
            int(r["part"])
            for r in self.manifest().collect()
            if r["min_cell"] is not None
            and r["min_cell"] <= hi and r["max_cell"] >= lo
        ]
        if not keep:
            raise ValueError(f"no partition intersects cell range [{lo}, {hi}]")
        from functools import reduce

        head = self.current_snapshot_id()
        parts_df = []
        for part in sorted(keep):
            path = os.path.join(self.data_dir, f"part={part}")
            pdf = self._read_version(
                path, part, version_sid=self._last_commit_sid(part) or 0,
                as_of_sid=head, keep_meta=_with_meta,
            )
            parts_df.append(self._apply_evolutions(pdf, head + 1))
        df = reduce(lambda a, b: a.unionByName(b), parts_df)
        for ev in self.schema_versions():
            if ev["name"] not in df.columns:
                df = df.withColumn(ev["name"], F.lit(ev["default"]).cast(ev["type"]))
        return df

    def verify(self, cell_col: str | None = None) -> DataFrame:
        """Recompute per-partition lineage from the data and diff against
        the manifest: zero rows = intact (detects partial/corrupt writes).

        After a schema evolution the table's partitions legitimately carry
        different file schemas (evolution never rewrites data), so each
        partition must be re-checksummed under ITS OWN file schema — the
        schema its manifest row was computed with. That path iterates
        partitions on the driver, which is metadata scale (same bound as
        commit itself), not data scale; the homogeneous-schema fast path
        stays one distributed pass."""
        if self.schema_versions():
            import pandas as pd

            m = {r["part"]: r.asDict() for r in self.manifest().collect()}
            on_disk = (
                {
                    int(d.split("=")[1])
                    for d in os.listdir(self.data_dir)
                    if d.startswith("part=")
                }
                if os.path.exists(self.data_dir)
                else set()
            )
            bad = []
            for part in sorted(set(m) | on_disk):
                if part not in m or part not in on_disk:
                    bad.append(part)
                    continue
                pdf = self.spark.read.parquet(
                    os.path.join(self.data_dir, f"part={part}")
                ).withColumn("part", F.lit(part))
                res = partition_manifest(pdf, "part", cell_col).collect()
                # an empty manifest result (partial/corrupt write left a
                # zero-row part dir) IS the corruption verify() exists to
                # flag — report a bad partition, don't crash on [0]
                if (
                    not res
                    or res[0]["n_rows"] != m[part]["n_rows"]
                    or res[0]["checksum"] != m[part]["checksum"]
                ):
                    bad.append(part)
            return self.spark.createDataFrame(
                pd.DataFrame({"part": pd.array(bad, dtype="int32")}), "part int"
            )
        data = self.spark.read.option("basePath", self.data_dir).parquet(self.data_dir)
        recomputed = partition_manifest(data, "part", cell_col)
        m = self.manifest()
        joined = recomputed.alias("a").join(m.alias("b"), "part", "full")
        return joined.where(
            (F.col("a.n_rows") != F.col("b.n_rows"))
            | (F.col("a.checksum") != F.col("b.checksum"))
            | F.col("a.n_rows").isNull()
            | F.col("b.n_rows").isNull()
        ).select("part")

    # -- metrics -----------------------------------------------------------

    def metrics(self) -> dict:
        """Per-partition throughput/skew metrics from the manifest."""
        rows = [r.asDict() for r in self.manifest().orderBy("part").collect()]
        if not rows:
            return {"partitions": 0, "rows_total": 0, "skew_ratio": None, "per_partition": []}
        counts = [r["n_rows"] for r in rows]
        mean = sum(counts) / len(counts)
        return {
            "partitions": len(rows),
            "rows_total": int(sum(counts)),
            "rows_max": int(max(counts)),
            "rows_mean": mean,
            "skew_ratio": round(max(counts) / mean, 3) if mean else None,
            "per_partition": rows,
        }


def zonal_refresh(
    run: IncrementalRun, admin: DataFrame, res: int, state_dir: str
) -> DataFrame:
    """Incremental VIEW MAINTENANCE for the flagship zonal aggregate:
    fold each committed-but-unfolded tile partition's zonal PARTIALS
    (adm_id, px_count, px_sum — additive, the mergeable-state property
    every distributive aggregate shares) into a per-partition state
    table, then return the merged per-zone stats. Folded partitions are
    NEVER rescanned — the daily-raster-drop pattern (reference run
    modes ``update``/``backfill``, seas5_pipeline.py:47-51) where a new
    day's tiles cost one partition's decode, not a corpus recompute.

    Idempotent and crash-safe: each partition's partials land with
    ``mode=overwrite`` under ``state_dir/part=N`` stamped with the
    manifest row's CHECKSUM (a ``_FOLDED_<checksum>`` marker written
    after the parquet commit) — a fold is valid only while its marker
    matches the partition's current manifest checksum, so a LATE
    RE-DELIVERY that overwrites a committed partition (the supported
    commit_partition path) invalidates and re-folds exactly that
    partition; a crashed fold (no marker) is rebuilt. Reading the state
    merges with a k-group sum — state size is O(partitions x zones),
    metadata scale.
    """
    import glob
    import shutil

    spark = run.spark
    from ..operators.raster import zonal_pixel_stats

    manifest = {
        r["part"]: r["checksum"]
        for r in run.manifest().select("part", "checksum").collect()
    }
    if not manifest:  # nothing committed yet: an empty (but valid) view
        return spark.createDataFrame(
            [], "adm_id string, px_count bigint, px_sum bigint, px_mean double"
        )
    for part, checksum in sorted(manifest.items()):
        pdir = os.path.join(state_dir, f"part={part}")
        marker = os.path.join(pdir, f"_FOLDED_{checksum}")
        if os.path.exists(marker):
            continue  # folded AND checksum-current: never rescanned
        if os.path.exists(pdir):  # crashed fold or stale (re-delivered) data
            shutil.rmtree(pdir)
        tiles = spark.read.parquet(os.path.join(run.data_dir, f"part={part}"))
        partial = zonal_pixel_stats(tiles, admin, res).select(
            "adm_id", "px_count", "px_sum"
        )
        partial.write.mode("overwrite").parquet(pdir)
        open(marker, "a").close()
    # drop state for partitions no longer in the manifest (defensive)
    for d in glob.glob(os.path.join(state_dir, "part=*")):
        if int(d.rsplit("=", 1)[1]) not in manifest:
            shutil.rmtree(d)
    state = spark.read.option("basePath", state_dir).parquet(state_dir)
    return (
        state.groupBy("adm_id")
        .agg(F.sum("px_count").alias("px_count"), F.sum("px_sum").alias("px_sum"))
        .select(
            "adm_id",
            "px_count",
            "px_sum",
            (F.col("px_sum").cast("double") / F.col("px_count")).alias("px_mean"),
        )
        .orderBy("adm_id")
    )
