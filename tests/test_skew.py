"""Salted aggregation/join equal their unsalted counterparts (exactness of
the two-phase decomposition), including on pathologically skewed keys."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kadiyadb_spark.functions import skew


def _skewed_df(spark):
    # 90% of rows share one hot key
    rows = [Row(id=i, k="hot" if i % 10 else f"cold{i}", v=float(i % 7)) for i in range(2000)]
    return spark.createDataFrame(rows)


def test_salted_sum_count_exact(spark):
    df = _skewed_df(spark)
    plain = {
        r["k"]: (r["total"], r["cnt"])
        for r in df.groupBy("k").agg(F.sum("v").alias("total"), F.count("*").cast("double").alias("cnt")).collect()
    }
    salted = {
        r["k"]: (r["total"], r["cnt"])
        for r in skew.salted_sum_count(df, ["k"], "v", unique_col="id", buckets=8).collect()
    }
    assert salted == plain


def test_salted_join_exact(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame(
        [Row(k="hot", label="H")] + [Row(k=f"cold{i}", label=f"C{i}") for i in range(0, 2000, 10)]
    )
    plain = sorted((r["id"], r["label"]) for r in big.join(dim, on="k").collect())
    salted = sorted(
        (r["id"], r["label"])
        for r in skew.salted_join(big, dim, on="k", buckets=8, unique_col="id").collect()
    )
    assert salted == plain


def test_salted_join_rejects_other_side_joins(spark):
    # 'right'/'full' would emit each unmatched dim row once per salt bucket
    big = _skewed_df(spark)
    dim = spark.createDataFrame([Row(k="hot", label="H")])
    for how in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            skew.salted_join(big, dim, on="k", buckets=4, unique_col="id", how=how)
