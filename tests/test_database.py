"""Persisted Database: open/track/merge/fetch/expire round-trips (O10-O13)."""

import pytest
from pyspark.sql import Row

from kadiyadb_spark.catalog import Params
from kadiyadb_spark.database import Database

P = Params(duration=5, resolution=1, retention=10, fields=("x", "y"))


def _events(spark, rows):
    return spark.createDataFrame([Row(ts=r[0], x=r[1], y=r[2], v=float(r[3])) for r in rows])


def _pts(df):
    out = []
    for r in df.collect():
        d = r.asDict()
        key = tuple(d[k] for k in sorted(d) if k.startswith("f") and d[k] is not None)
        out.append((d["epoch"], key, d["bucket"], d["total"], d["cnt"]))
    return sorted(out)


def test_open_writes_and_reads_params(spark, tmp_path):
    db = Database.open(spark, str(tmp_path / "db1"), P)
    db2 = Database.open(spark, str(tmp_path / "db1"))
    assert db2.params == P


def test_track_fetch_roundtrip(spark, tmp_path):
    db = Database.open(spark, str(tmp_path / "db"), P)
    db.track(_events(spark, [(0, "a", "b", 5.0), (1, "a", "b", 7.0)]), total_col="v")
    got = _pts(db.fetch(0, 2, ["a", "b"]))
    assert got == [(0, ("a", "b"), 0, 5.0, 1.0), (0, ("a", "b"), 1, 7.0, 1.0)]
    # rollup prefix persisted too
    got1 = _pts(db.fetch(0, 2, ["a"]))
    assert got1 == [(0, ("a",), 0, 5.0, 1.0), (0, ("a",), 1, 7.0, 1.0)]


def test_track_increments_across_batches(spark, tmp_path):
    db = Database.open(spark, str(tmp_path / "db"), P)
    db.track(_events(spark, [(0, "a", "b", 5.0)]), total_col="v")
    db.track(_events(spark, [(0, "a", "b", 2.0), (6, "a", "c", 1.0)]), total_col="v")
    got = _pts(db.fetch(0, 1, ["a", "b"]))
    assert got == [(0, ("a", "b"), 0, 7.0, 2.0)]  # 5+2, count 1+1
    # second epoch written without clobbering the first
    got2 = _pts(db.fetch(5, 7, ["a", "c"]))
    # slot 5 zero-filled (series exists in epoch 5), slot 6 has the point
    assert got2 == [(5, ("a", "c"), 5, 0.0, 0.0), (5, ("a", "c"), 6, 1.0, 1.0)]


def test_merge_replace_overwrites_matched_keys(spark, tmp_path):
    db = Database.open(spark, str(tmp_path / "db"), P)
    db.track(_events(spark, [(0, "a", "b", 5.0)]), total_col="v")
    cumulative = db.cube().limit(0)  # schema template
    rows = db.cube().collect()
    # simulate an update-mode batch carrying new cumulative values
    updated = spark.createDataFrame([r.asDict() | {"total": 99.0, "cnt": 9.0} for r in rows], db.cube().schema)
    db.merge_replace(updated)
    got = _pts(db.fetch(0, 1, ["a", "b"]))
    assert got == [(0, ("a", "b"), 0, 99.0, 9.0)]


def test_expire_drops_old_epochs(spark, tmp_path):
    db = Database.open(spark, str(tmp_path / "db"), P)
    db.track(_events(spark, [(0, "a", "b", 1.0), (5, "a", "b", 2.0), (11, "a", "b", 3.0)]), total_col="v")
    dropped = db.expire(before_ts=5)
    assert dropped == [0]
    assert db.fetch(0, 5, ["a", "b"]).count() == 0
    assert _pts(db.fetch(5, 6, ["a", "b"])) == [(5, ("a", "b"), 5, 2.0, 1.0)]
    # retention-driven: now=21, retention=10 -> cutoff 11 -> epoch 5 dropped
    assert db.expire_by_retention(now_ts=21) == [5]


def test_compact_reduces_files_preserves_values(spark, tmp_path):
    import os

    db = Database.open(spark, str(tmp_path / "db"), P)
    # several small batches fragment epoch 0 into multiple files
    for i in range(3):
        db.track(_events(spark, [(i, "a", "b", float(i + 1))]), total_col="v")
    before = _pts(db.fetch(0, 5, ["a", "b"]))
    part = os.path.join(db.cube_path, "epoch=0")
    db_files = lambda: sum(1 for f in os.listdir(part) if f.endswith(".parquet"))
    assert db_files() >= 1
    compacted = db.compact(max_files_per_epoch=1)
    assert db_files() == 1
    assert _pts(db.fetch(0, 5, ["a", "b"])) == before
    # idempotent: nothing left to compact
    assert db.compact(max_files_per_epoch=1) == []


def test_compact_sorts_series_major(spark, tmp_path):
    """Compacted epochs are series-major (depth, f1.., bucket): each series'
    slots are contiguous in the file — the reference's record-major block
    layout (block/block.go:53-61) — so dimension row-group stats narrow."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    db = Database.open(spark, str(tmp_path / "db"), P)
    rows = [
        Row(ts=(i % 4) * P.resolution, x=f"x{i % 3}", y=f"y{i % 2}", v=1.0)
        for i in range(24)
    ]
    db.track(spark.createDataFrame(rows), total_col="v")
    # fragment epoch 0 the way an out-of-band writer would: an appended file
    extra = db.cube().limit(1).withColumn("f1", F.lit("zzz"))
    extra.write.mode("append").partitionBy("epoch").parquet(db.cube_path)
    assert db.compact(max_files_per_epoch=1) != []
    # parquet preserves in-file row order; read RAW (cube()'s fold shuffles)
    raw = spark.read.parquet(db.cube_path)
    got = [
        (r["depth"], r["f1"] or "", r["f2"] or "", r["bucket"])
        for r in raw.collect()
    ]
    assert got == sorted(got)


def test_track_appends_without_rewrite_and_folds_exactly(spark, tmp_path):
    """LSM write path: each track() appends delta files (earlier files are
    never rewritten), and cube() folds duplicates to exact sums."""
    import os

    db = Database.open(spark, str(tmp_path / "db"), P)
    db.track(_events(spark, [(0, "a", "b", 1.0)]), total_col="v")
    part = os.path.join(db.cube_path, "epoch=0")
    first_files = set(os.listdir(part))
    db.track(_events(spark, [(0, "a", "b", 2.0)]), total_col="v")
    after = set(os.listdir(part))
    # append-only: the first batch's files survive untouched, new ones added
    assert first_files <= after and len(after) > len(first_files)
    # the fold is exact: one row per key, summed
    assert _pts(db.fetch(0, 1, ["a", "b"])) == [(0, ("a", "b"), 0, 3.0, 2.0)]
    assert db.cube().filter("depth = 2").count() == 1
