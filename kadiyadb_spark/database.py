"""Database — persisted form of the engine (O10/O12/O13).

Layout mirrors the reference (SURVEY §1.3): a database is a directory with
``params.json`` and a ``cube/`` parquet table partitioned by ``epoch``; epoch
partitions are independent, so writes to one never rewrite another
(epoch/epoch.go:11-13), retention is a partition drop, and time-range queries
prune partitions.

The reference's RO/RW epoch pools, mmap, WAL and snapshots (O10/O12/O14/O15)
are storage-engine mechanics Spark replaces: parquet footers + partition
pruning play the snapshot/index role, dynamic partition overwrite plays the
RW-epoch role, and Sync is the write itself.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kadiyadb_spark import schema as S
from kadiyadb_spark.catalog import Params
from kadiyadb_spark.ingest import track_batch
from kadiyadb_spark.query import fetch as fetch_df


class Database:
    """Open/Track/Fetch/Expire on a persisted epoch-partitioned cube."""

    def __init__(self, spark: SparkSession, path: str, params: Params):
        self.spark = spark
        self.path = path
        self.params = params
        self.cube_path = os.path.join(path, "cube")

    # -- O13 Open ------------------------------------------------------------
    @classmethod
    def open(cls, spark: SparkSession, path: str, params: Params | None = None) -> "Database":
        pj = os.path.join(path, "params.json")
        if params is None:
            params = Params.from_json_file(pj)
        else:
            os.makedirs(path, exist_ok=True)
            if not os.path.exists(pj):
                with open(pj, "w") as f:
                    json.dump(params.to_dict(), f)
        return cls(spark, path, params)

    @property
    def max_depth(self) -> int:
        return len(self.params.fields)

    def cube(self) -> DataFrame:
        """The cube as a DataFrame, FOLDED to one row per cube key.

        ``track`` appends delta files (LSM-style, see its docstring), so an
        epoch directory may hold several partial rows per (bucket, fields,
        depth) key; the fold is a sum groupBy — exact, because the Point is
        a decomposable (total, count) pair (SURVEY §1.1). Catalyst pushes
        epoch/dimension predicates below the fold (grouping-key filters), so
        partition pruning and row-group skipping still reach the scan; after
        ``compact`` the fold is a per-key identity. Empty-schema DataFrame if
        nothing written yet; partition column ``epoch`` comes back long."""
        if not os.path.isdir(self.cube_path):
            return self.spark.createDataFrame([], S.cube_schema(self.max_depth))
        df = self.spark.read.parquet(self.cube_path)
        cols = [f.name for f in S.cube_schema(self.max_depth).fields]
        df = df.select(*[F.col(c).cast(t.dataType).alias(c) for c, t in zip(cols, S.cube_schema(self.max_depth))])
        keys = [S.EPOCH, S.BUCKET, *S.field_cols(self.max_depth), S.DEPTH]
        return df.groupBy(*keys).agg(
            F.sum(S.TOTAL).alias(S.TOTAL), F.sum(S.CNT).alias(S.CNT)
        ).select(*cols)

    # -- O1 Track (micro-batch) ---------------------------------------------
    def track(self, events: DataFrame, ts_col: str = "ts", total_col: str = "value", count_col: str | None = None) -> None:
        """Append-increment a batch of events into the persisted cube.

        LSM-style write path: aggregate the batch to cube deltas (one
        shuffle) and APPEND them as new files under the touched epoch
        partitions — no read, no rewrite, no driver-side epoch listing. The
        old merge-by-rewrite path re-read and overwrote every touched epoch
        per micro-batch (write amplification ~ epoch size / batch size, the
        design risk VERDICT r1 carried forward); appends make the write cost
        proportional to the BATCH, like the reference's in-place atomic adds
        (block/blockrw.go:60-78). Reads fold the deltas exactly (see
        ``cube``); periodic ``compact`` folds them physically."""
        p = self.params
        delta = track_batch(
            events,
            fields=list(p.fields),
            ts_col=ts_col,
            total_col=total_col,
            count_col=count_col,
            resolution=p.resolution,
            duration=p.duration,
        )
        (
            delta.repartition(S.EPOCH)
            .write.partitionBy(S.EPOCH)
            .mode("append")
            .parquet(self.cube_path)
        )

    # -- streaming idempotency ------------------------------------------------
    def _stream_meta_path(self, stream_id: str) -> str:
        return os.path.join(self.path, "_streams", f"{stream_id}.json")

    def applied_batch_hwm(self, stream_id: str) -> int:
        """Highest micro-batch id already merged for ``stream_id``; -1 if none."""
        try:
            with open(self._stream_meta_path(stream_id)) as f:
                return int(json.load(f)["batch_id"])
        except (OSError, ValueError, KeyError):
            return -1

    def _commit_batch(self, stream_id: str, batch_id: int) -> None:
        path = self._stream_meta_path(stream_id)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.replace(tmp, path)  # atomic on POSIX

    def track_stream_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        stream_id: str = "raw",
        ts_col: str = "ts",
        total_col: str = "value",
        count_col: str | None = None,
    ) -> bool:
        """Increment-merge one micro-batch, idempotent under replay.

        Structured Streaming re-runs a foreachBatch with the SAME batch_id
        after a sink failure or restart-from-checkpoint; a bare increment
        merge would double-count those rows (SURVEY §7's one real design
        risk). Batch ids are monotonically increasing per checkpoint, so an
        applied-batch high-water mark stored beside the cube makes replays
        no-ops. The marker is written AFTER the data commit: a crash landing
        exactly between the two re-applies that one batch — closing that last
        window needs an atomic data+marker commit (a transactional table
        format, e.g. Delta MERGE with txn app ids; not available in this
        container — documented trade-off). Returns True if the batch was
        applied, False if skipped as already applied."""
        if batch_id <= self.applied_batch_hwm(stream_id):
            return False
        self.track(batch, ts_col=ts_col, total_col=total_col, count_col=count_col)
        self._commit_batch(stream_id, batch_id)
        return True

    def merge_replace(self, delta: DataFrame) -> None:
        """Replace-merge cube-shaped delta rows (cumulative values win over
        stored ones) — the sink for update-mode streaming aggregation, where
        each emitted row is the running (total, cnt) for its group."""
        fcols = S.field_cols(self.max_depth)
        keys = [S.EPOCH, S.BUCKET, *fcols, S.DEPTH]
        delta = delta.select(*keys, S.TOTAL, S.CNT)
        if not os.path.isdir(self.cube_path):
            delta.repartition(S.EPOCH).write.partitionBy(S.EPOCH).mode("overwrite").parquet(self.cube_path)
            return
        delta = delta.persist()
        try:
            touched = [r[0] for r in delta.select(S.EPOCH).distinct().collect()]
            if not touched:
                return
            existing = self.cube().filter(F.col(S.EPOCH).isin(touched))
            # NULL-safe key equality: f-columns are null for prefix rows, and
            # a plain equality join would never match them.
            d = delta.select(*keys)
            cond = None
            for k in keys:
                c = existing[k].eqNullSafe(d[k])
                cond = c if cond is None else (cond & c)
            merged = existing.join(d, on=cond, how="left_anti").unionByName(delta)
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            merged.repartition(S.EPOCH).write.partitionBy(S.EPOCH).mode("overwrite").parquet(self.cube_path)
        finally:
            delta.unpersist()

    # -- O2 Fetch ------------------------------------------------------------
    def fetch(self, from_ts: int, to_ts: int, pattern: list[str], densify: bool = True) -> DataFrame:
        return fetch_df(
            self.cube(),
            from_ts,
            to_ts,
            pattern,
            resolution=self.params.resolution,
            duration=self.params.duration,
            densify=densify,
        )

    # -- O11 Expire ----------------------------------------------------------
    def expire(self, before_ts: int) -> list[int]:
        """Drop epoch partitions strictly older than ``before_ts``
        (epoch/cache.go:136-156 — there RemoveAll of epoch dirs; here a
        partition-directory drop, no data rewrite)."""
        import shutil

        dropped = []
        if not os.path.isdir(self.cube_path):
            return dropped
        cutoff = before_ts - (before_ts % self.params.duration)
        for name in os.listdir(self.cube_path):
            if not name.startswith(f"{S.EPOCH}="):
                continue
            try:
                e = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if e < cutoff:
                shutil.rmtree(os.path.join(self.cube_path, name))
                dropped.append(e)
        return sorted(dropped)

    def expire_by_retention(self, now_ts: int) -> list[int]:
        return self.expire(now_ts - self.params.retention)

    # -- maintenance ----------------------------------------------------------
    def compact(self, max_files_per_epoch: int = 1, sort_series: bool = True) -> list[int]:
        """Rewrite fragmented epoch partitions down to ``max_files_per_epoch``
        parquet files each, by default sorted series-major
        (depth, f1..fN, bucket) — each series' slots become contiguous runs,
        the parquet analog of the reference's record-major block layout
        (block/block.go:53-61: rows r0..rM x slots p0..pN), and row-group
        min-max stats on the dimension and bucket columns both narrow, so
        exact-path fetches skip row groups.

        Why this exists: ``track`` APPENDS one delta file set per
        micro-batch (LSM write path — no write amplification), so a
        frequently-written epoch accumulates files and every read re-folds
        them; compaction folds physically, restoring 1-row-per-key,
        scan-friendly layout — the LSM memtable-flush/SSTable-merge role.
        The reads-stay-exact guarantee comes from ``cube``'s fold. A
        transactional table format (Delta/Iceberg MERGE + txn app ids +
        OPTIMIZE) would add row-level upsert and atomic data+marker commits;
        not available in this container — append+fold+compact is the honest
        parquet-native equivalent. Returns the compacted epoch ids."""
        if not os.path.isdir(self.cube_path):
            return []
        # Driver-side directory listing finds the fragmented epochs (cheap
        # metadata scan), then ONE filtered read + dynamic partition
        # overwrite rewrites them all — a single job instead of a driver
        # loop launching one job per epoch (at 720 epochs/month the loop's
        # per-job scheduling latency dominates the actual I/O).
        fragmented = []
        for name in sorted(os.listdir(self.cube_path)):
            if not name.startswith(f"{S.EPOCH}="):
                continue
            part_dir = os.path.join(self.cube_path, name)
            n_files = sum(1 for f in os.listdir(part_dir) if f.endswith(".parquet"))
            if n_files > max_files_per_epoch:
                fragmented.append(int(name.split("=", 1)[1]))
        if not fragmented:
            return []
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        part = self.cube().filter(F.col(S.EPOCH).isin(fragmented))
        # Hash-repartition by epoch: every epoch lands in exactly one task,
        # so each rewritten partition dir holds ONE file (<= any max). An
        # epoch too large for a single writer task would want a salted key
        # here; epochs are sized by params.duration precisely so they stay
        # task-sized (SURVEY §1.6).
        part = part.repartition(len(fragmented), F.col(S.EPOCH))
        if sort_series:
            # epoch leads the sort so the partitioned-write path sees its
            # ordering requirement already satisfied and does NOT insert
            # its own (order-scrambling) sort on the partition column
            fcols = S.field_cols(len(self.params.fields))
            part = part.sortWithinPartitions(S.EPOCH, S.DEPTH, *fcols, S.BUCKET)
        part.write.partitionBy(S.EPOCH).mode("overwrite").parquet(self.cube_path)
        return fragmented

    # -- O12 Sync ------------------------------------------------------------
    def sync(self) -> None:
        """No-op: parquet writes are durable on commit (SURVEY O12)."""


def load_all_open(spark: SparkSession, root: str) -> dict[str, Database]:
    """Open every valid database under ``root`` — the reference's
    ``LoadAll(dir) map[string]*DB`` (database.go:66-124) returns OPEN handles,
    not just parsed params; ``catalog.load_all`` stays the params-only form."""
    from kadiyadb_spark.catalog import load_all

    return {
        name: Database.open(spark, os.path.join(root, name), params)
        for name, params in load_all(root).items()
    }
