"""Z-order layout: the point is QUANTIFIED data skipping — after Z-order
re-layout, every cluster column's per-file min-max span is narrow, so
filters on ANY of them prune files. Compared against a single-column sort,
where the second column's spans stay full-width (no pruning possible)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kadiyadb_spark.layout import quantize_expr, zorder_key_expr, zorder_layout


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([Row(x=0b101, y=0b011)])
    key = df.select(zorder_key_expr([F.col("x"), F.col("y")], bits=3).alias("k")).collect()[0].k
    # bit b of col i -> position b*2+i: x bits at even, y bits at odd slots
    # x=101, y=011 -> positions: x0=1@0, y0=1@1, x1=0@2, y1=1@3, x2=1@4, y2=0@5
    assert key == 0b011011


def test_quantize_clamps_and_buckets(spark):
    df = spark.createDataFrame([Row(v=-5.0), Row(v=0.0), Row(v=50.0), Row(v=100.0), Row(v=999.0)])
    got = [r.q for r in df.select(quantize_expr(F.col("v"), 0, 100, bits=2).alias("q")).collect()]
    assert got == [0, 0, 1, 3, 3]


def _file_spans(spark, path, col):
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name())
        .agg((F.max(col) - F.min(col)).alias("span"))
    )
    rows = per_file.collect()
    return sum(r.span for r in rows) / len(rows), len(rows)


def test_zorder_narrows_every_columns_file_spans(spark, tmp_path):
    # two independent uniform dimensions — the worst case for 1-col sorting
    n = 20_000
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 1000).alias("x"),
        ((F.col("id") * 40503) % 1000).alias("y"),
    )
    xsort = str(tmp_path / "xsort")
    zord = str(tmp_path / "zorder")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xsort)
    qx = quantize_expr(F.col("x"), 0, 999, bits=8)
    qy = quantize_expr(F.col("y"), 0, 999, bits=8)
    zorder_layout(df, [qx, qy], num_files=16, bits=8).write.parquet(zord)

    x_span_xsort, nf1 = _file_spans(spark, xsort, "x")
    y_span_xsort, _ = _file_spans(spark, xsort, "y")
    x_span_z, nf2 = _file_spans(spark, zord, "x")
    y_span_z, _ = _file_spans(spark, zord, "y")
    assert nf1 >= 8 and nf2 >= 8
    # single-column sort: x narrow but y spans ~the full 0..999 domain
    assert x_span_xsort < 200
    assert y_span_xsort > 800
    # z-order: BOTH columns' per-file spans are a fraction of the domain —
    # a filter on either column can prune most files via footer stats
    assert x_span_z < 600 and y_span_z < 600
    assert y_span_z < y_span_xsort / 1.5


def test_zorder_rejects_bit_overflow(spark):
    with pytest.raises(ValueError, match="int64 budget"):
        zorder_key_expr([F.lit(1)] * 8, bits=8)


def test_bucketed_join_elides_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must join with NO Exchange —
    the write-time shuffle is the amortized one. (The in-bucket Sort stays:
    Spark >= 3.0 does not report bucket sort order from scans by default —
    spark.sql.legacy.bucketedTableScan.outputOrdering — and a sort of one
    bucket is noise next to the shuffle it replaces.)"""
    import contextlib
    import io

    from kadiyadb_spark.layout import write_bucketed

    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    write_bucketed(left, "kdbt_left_b", ["k"], 4, sort_cols=["k"])
    write_bucketed(right, "kdbt_right_b", ["k"], 4, sort_cols=["k"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("kdbt_left_b").join(spark.table("kdbt_right_b"), "k")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert j.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS kdbt_left_b")
        spark.sql("DROP TABLE IF EXISTS kdbt_right_b")
